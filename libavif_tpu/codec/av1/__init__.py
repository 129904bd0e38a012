"""Spec-conformant AV1 intra codec (decode + still encode).

This package implements real AV1 bitstream syntax — frame headers (§5.9),
partition trees (§5.11.4), the coefficient model (§5.11.39), spec inverse
transforms (§7.13), and spec intra prediction (§7.11) — so that files
written by this framework decode in dav1d/libaom and foreign AVIF files
decode here. The role in the architecture matches the reference's external
codec delegation (SURVEY.md §2.2, codec_dav1d.c/codec_aom.c), implemented
natively: sequential symbol decoding on the host, batched reconstruction
math in numpy/JAX.
"""
