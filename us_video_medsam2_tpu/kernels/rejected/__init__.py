"""A/B-tested-and-rejected kernels, kept for the measurement record only.

Nothing here is wired into the model. Each module's docstring records the
device numbers that rejected it (see docs/ROADMAP.md for the full A/B log).
Live kernels live one directory up in `kernels/`.
"""
