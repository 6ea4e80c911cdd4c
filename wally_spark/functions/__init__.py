"""Reusable column-expression builders (JVM-side, codegen-friendly)."""

from wally_spark.functions.framing import decode_frame, encode_frame  # noqa: F401
from wally_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
