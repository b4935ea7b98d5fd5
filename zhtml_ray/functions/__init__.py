"""Generic large-scale training-data operators (beyond the reference's
parsing scope): text analysis, deduplication, similarity search,
multimodal plumbing. All are batch-level Ray Data transforms."""
