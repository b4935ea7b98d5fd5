from zhtml_ray.stages.parse_extract import ParseExtractBatch, OUT_SCHEMA

__all__ = ["ParseExtractBatch", "OUT_SCHEMA"]
