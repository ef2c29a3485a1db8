"""Main-content extraction: HTML boilerplate strip via DOM link-density
heuristics (readability/jusText family).

The page is segmented into text blocks at block-level tag boundaries; each
block accumulates its visible text plus the share of that text that sits
inside ``<a>`` anchors. A block survives as *content* iff it has enough
prose (``MIN_CONTENT_CHARS``) and is not link-dominated (link chars must be
under 1/3 of the block text — the classic jusText link-density cut).
Navigation bars, related-links rails and footers are link-dominated by
construction on real pages, so they fall out without any site-specific
rules.

Pure stdlib + O(page) single pass — designed to run inside an Arrow-batched
pandas UDF over billions of transcript turns (see queries.q28).
"""

from __future__ import annotations

import re

# Tags that delimit text blocks (HTML5 flow-content sectioning + paragraphs).
BLOCK_TAGS = frozenset(
    "p div article section nav aside footer header main ul ol li table tr td th "
    "h1 h2 h3 h4 h5 h6 blockquote pre body".split()
)
# Raw-text elements whose content is never visible prose.
_RAWTEXT = frozenset({"script", "style"})

MIN_CONTENT_CHARS = 20
LINK_DENSITY_NUM = 3  # keep iff link_chars * 3 < text_chars

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:._-]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*?)(/?)>")
_WS_RE = re.compile(r"\s+")


def _blocks(html: str):
    """Yield (text, link_chars) per block-level segment, single pass."""
    pos = 0
    buf: list[str] = []
    link_chars = 0
    a_depth = 0
    raw_until: str | None = None
    out: list[tuple[str, int]] = []

    def flush() -> None:
        nonlocal buf, link_chars
        text = _WS_RE.sub(" ", "".join(buf)).strip()
        if text:
            out.append((text, link_chars))
        buf = []
        link_chars = 0

    for m in _TAG_RE.finditer(html):
        chunk = html[pos : m.start()]
        pos = m.end()
        closing, name, _, _ = m.groups()
        name = name.lower()
        if raw_until is not None:
            # Inside <script>/<style>: drop everything until the matching close.
            if closing and name == raw_until:
                raw_until = None
            continue
        if chunk:
            buf.append(chunk)
            if a_depth > 0:
                link_chars += len(chunk.strip())
        if name in _RAWTEXT and not closing:
            raw_until = name
        elif name == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
        elif name in BLOCK_TAGS:
            flush()
    tail = html[pos:]
    if tail and raw_until is None:
        buf.append(tail)
        if a_depth > 0:
            link_chars += len(tail.strip())
    flush()
    return out


def extract_main_text(html: str) -> str:
    """Strip boilerplate; return content blocks joined by newlines."""
    kept = [
        text
        for text, link_chars in _blocks(html)
        if len(text) >= MIN_CONTENT_CHARS and link_chars * LINK_DENSITY_NUM < len(text)
    ]
    return "\n".join(kept)
