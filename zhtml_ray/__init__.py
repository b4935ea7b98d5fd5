"""zhtml_ray — a Ray-Data-native main-content extraction engine.

Re-expresses the capabilities of the reference (watzon/zhtml: a WHATWG
HTML5 tokenizer + tree-construction library, see SURVEY.md) as an
idiomatic Ray Data pipeline: trillion-row Parquet shards of
Common-Crawl-style pages stream through ``ray.data.Dataset.map_batches``
over zero-copy Arrow, with actor pools holding warm parser state, then
a boilerplate-removal extraction layer (text-density + link-density DOM
heuristics) producing ``(url, extracted_text, spans)``.

Layout:
    html/       pure-Python HTML5 tokenizer, tree builder, extractor
                (the per-document kernel; no Ray imports)
    sources/    dataset readers + deterministic synthetic pages table
    stages/     Ray Data batch-UDF stages (actor pools, skew handling,
                checkpoint manifests)
    functions/  generic training-data operators: dedup, similarity,
                text analysis, multimodal stubs
    pipelines/  end-to-end pipelines + driver ``queries()`` glue
"""

__version__ = "0.1.0"

# Workaround: this container has fsspec without aiohttp, so importing
# fsspec.implementations.http raises — and under concurrent Ray Data
# reads (threaded sub-executions) the failed import can race into a
# plain ImportError that ray.data.datasource.path_util doesn't catch.
# Install a sentinel module so the import always succeeds; Ray only uses
# HTTPFileSystem in isinstance checks, never instantiates it here.


def _patch_fsspec_http() -> None:
    import sys
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel for isinstance checks only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_patch_fsspec_http()
