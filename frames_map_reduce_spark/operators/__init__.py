"""Scale extension operators: dedup, similarity search, multimodal."""

from frames_map_reduce_spark.operators import (dedup, multimodal,  # noqa: F401
                                               quantized, similarity)
