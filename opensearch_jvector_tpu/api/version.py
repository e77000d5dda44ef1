__version__ = "0.1.0"

# On-disk format versions (mirrors the reference's versioned codec scheme,
# JVectorFormat.java:31-33 — v1 added the quantizationType byte; we start at 1
# with quantization type always present).
FORMAT_VERSION = 1
MIN_SUPPORTED_FORMAT_VERSION = 1
