"""Interop readers: independent implementations of public table formats.

Modules here are deliberately firewalled from the write paths in
``sinks/`` — they import nothing from this package outside ``interop``
and are written only from public format specifications, so they can
serve as an adversarial second implementation when no third-party
reader is installable (see ``interop/delta_reader.py``).
"""
