"""Scalar/vector function surface: column-expression helpers plus the
pandas-UDF kernels (inference, NMS, media) that form the engine's
user-function layer."""
