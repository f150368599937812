"""URL -> facet parsing: the web-payload analog of the reference's
path-to-facet parser (/root/reference/src/services/RAG/path_meta.py:18-56).

Where the reference derives DEPT/LEVEL/SEMESTER/COURSE facets from the last
five path components and builds a GROUP_KEY with a precedence chain, we
derive host/section/slug facets from the url and build the index-build
shuffle key with the same precedence idea:

    group_key = "{host}:{section}" if both else host else "MISC"
    (reference precedence chain: path_meta.py:46-50; ":" joiner keeps the
    key safe as a hive-partition directory name for index shards)
"""

from __future__ import annotations

from typing import Dict
from urllib.parse import urlsplit


def parse_url_meta(url: str) -> Dict[str, str]:
    try:
        parts = urlsplit(url)
        host = parts.netloc.lower()
        path = parts.path or "/"
    except ValueError:
        host, path = "", "/"
    segs = [s for s in path.split("/") if s]
    section = segs[0].lower() if len(segs) > 1 else ""
    slug = segs[-1] if segs else ""
    tld = host.rsplit(".", 1)[-1] if "." in host else ""
    group_key = f"{host}:{section}" if (host and section) else (host or "MISC")
    return {
        "host": host,
        "section": section,
        "slug": slug,
        "tld": tld,
        "group_key": group_key,
    }
