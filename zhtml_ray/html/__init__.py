"""Pure-Python per-document HTML5 kernel: tokenizer → tree builder →
main-content extractor. No Ray imports — this package is the sequential
"inner loop" that Ray Data stages call per row inside ``map_batches``."""
