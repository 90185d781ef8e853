"""Large-scale training-data pipeline operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal column plumbing.

Every operator is a DataFrame→DataFrame function designed so that scaling to
100 TB is a cluster-sizing question: no driver-side collection, shuffles only
on bounded keys (shingle buckets, LSH bands, IVF cells), Python only via
Arrow-batched Pandas UDFs.
"""
