"""Canonical HTML -> (text, hrefs) extraction.

This single pure-Python implementation IS the reference extractor for
the byte-identical-text-per-url invariant (BASELINE.json input_hint):
the distributed actor-pool stage (stages/extract.py) and any
single-process oracle both call these functions, and the fixture
generator composes pages whose expected text is derived independently
from the same *specification* (tags -> space, entities unescaped,
whitespace collapsed), so tests are parse-vs-compose, not circular.

Deterministic by construction: regexes compiled at import, utf-8 decode
with errors="replace", no locale / environment dependence.
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin, urldefrag

# script/style blocks vanish entirely (their content is not page text)
_SCRIPT_STYLE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")

# href attribute inside an <a ...> tag: double-quoted, single-quoted or bare
_AHREF = re.compile(
    rb"<a\s[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))",
    re.IGNORECASE | re.DOTALL,
)


def extract_text(html_bytes: bytes) -> str:
    """Decode + strip an HTML byte payload to canonical plain text.

    Spec: drop <script>/<style> blocks and comments; every remaining tag
    becomes a single space; HTML entities are unescaped; whitespace runs
    collapse to one space; result is stripped.
    """
    if not html_bytes:
        return ""
    raw = _COMMENT.sub(b" ", _SCRIPT_STYLE.sub(b" ", html_bytes))
    s = raw.decode("utf-8", errors="replace")
    s = _TAG.sub(" ", s)
    s = _html.unescape(s)
    return _WS.sub(" ", s).strip()


def extract_hrefs(html_bytes: bytes, base_url: str) -> list[str]:
    """All <a href> targets, resolved against base_url, fragments dropped,
    http(s) only.  Duplicates preserved (multigraph semantics — the
    reference keeps parallel edges, SURVEY.md section 1.3); dedup is a
    separate downstream operator.
    """
    if not html_bytes:
        return []
    out: list[str] = []
    for m in _AHREF.finditer(html_bytes):
        raw = next(g for g in m.groups() if g is not None)
        href = _html.unescape(raw.decode("utf-8", errors="replace").strip())
        if not href:
            continue
        absu = urldefrag(urljoin(base_url, href))[0]
        if absu.startswith("http://") or absu.startswith("https://"):
            out.append(absu)
    return out


# full <a href=...>inner</a> element: href (3 quoting forms) + inner HTML
_APAIR = re.compile(
    rb"<a\s[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))"
    rb"[^>]*>(.*?)</a\s*>",
    re.IGNORECASE | re.DOTALL,
)


def extract_anchor_pairs(html_bytes: bytes, base_url: str) -> list[tuple[str, str]]:
    """All (<a href> target, anchor text) pairs: href resolved/filtered
    exactly like ``extract_hrefs`` (urljoin, fragment dropped, http(s)
    only, duplicates preserved); anchor text goes through the same spec
    as ``extract_text`` (inner tags -> space, entities unescaped,
    whitespace collapsed, stripped).  Anchors whose element never
    closes are not pairs and are skipped — so this can return FEWER
    rows than extract_hrefs; the edge table stays extract_hrefs-based
    and this feeds the anchor-text index only.
    """
    if not html_bytes:
        return []
    out: list[tuple[str, str]] = []
    for m in _APAIR.finditer(html_bytes):
        raw = next(g for g in m.groups()[:3] if g is not None)
        href = _html.unescape(raw.decode("utf-8", errors="replace").strip())
        if not href:
            continue
        absu = urldefrag(urljoin(base_url, href))[0]
        if not (absu.startswith("http://") or absu.startswith("https://")):
            continue
        inner = m.group(4).decode("utf-8", errors="replace")
        text = _WS.sub(" ", _html.unescape(_TAG.sub(" ", inner))).strip()
        out.append((absu, text))
    return out
