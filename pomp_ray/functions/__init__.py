from pomp_ray.functions.textfns import (  # noqa: F401
    html_extract_links,
    html_extract_text,
    html_extract_title,
    url_canonicalize,
    url_host,
    url_join,
)
