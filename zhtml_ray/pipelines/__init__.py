from zhtml_ray.pipelines.extract import (
    extract_pages, pages_dir_for, run_extract,
)

__all__ = ["extract_pages", "pages_dir_for", "run_extract"]
