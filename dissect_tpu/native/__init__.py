"""Native (C++) components: fast BED decoding and binary IO.

The reference's performance-critical host-side code (OpenMP BED parsing,
genotype.cpp:548-787) maps to a small C++ library built via setuptools/
ctypes; Python falls back to the vectorized numpy decoder when the
shared library has not been built (see bed_native.py).
"""
