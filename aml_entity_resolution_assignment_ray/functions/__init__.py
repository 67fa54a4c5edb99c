"""Pure computational kernels (no Ray dependency).

The build environment has none of the reference's C-extension similarity
libraries (jellyfish / datasketch / xgboost), so every scalar function the
reference calls is reimplemented here as a numpy-vectorized batch kernel
(SURVEY.md §2.11).
"""
