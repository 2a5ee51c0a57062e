"""Pure HTML synthesis: (doc_id, text, lang) -> Common-Crawl-style page.

Design contract with the extractor (extraction/boilerplate.py):
  - oracle text = "\\n\\n".join(content paragraph texts); paragraphs are the
    "\\n\\n"-split of the input text, so extraction is LOSSLESS and the
    pipeline's end-to-end oracle is simply the input text column.
  - every boilerplate element is robustly boilerplate by construction:
    inside a semantic boiler ancestor (nav/header/footer/aside) OR with
    link density > 1/3;
  - content is guaranteed extractable: pages whose paragraphs are all
    > 40 words rely on pure density rules (seeded 50% also get a semantic
    <article> wrapper, like real pages); shorter docs always get the
    <article> wrapper (an honest signal real CC pages carry).

Skew: hosts are Zipf-ish (log-uniform rank), and ~1/250 pages are padded
with repeated boilerplate to multi-100KB size — the heavy tail the salted
repartition stage must defuse (FIXTURES.md §1).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import random
import re as _re
from html import escape

N_HOSTS = 1000
_WORDS = ("archive news review update daily extra media portal online global "
          "local tech sport markt wetter kultur forum wiki blog shop").split()

BASE_TS = _dt.datetime(2025, 1, 1, 0, 0, 0)


def _rng(doc_id: int) -> random.Random:
    # derive a stable stream per doc from a cryptographic hash of the id
    seed = int.from_bytes(hashlib.sha256(str(doc_id).encode()).digest()[:8], "big")
    return random.Random(seed)


def host_for(doc_id: int) -> int:
    """Zipf-ish host assignment: log-uniform rank -> heavy head."""
    u = _rng(doc_id * 2 + 1).random()
    return max(1, int(N_HOSTS ** u)) - 1


def url_for(doc_id: int) -> str:
    h = host_for(doc_id)
    return f"https://host{h:04d}.example/{_WORDS[doc_id % len(_WORDS)]}/{doc_id}"


def warc_ts_for(doc_id: int) -> _dt.datetime:
    return BASE_TS + _dt.timedelta(seconds=int(doc_id) * 7 % 31_536_000)


def _nav_links(rng: random.Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w.capitalize()}</a></li>'
        for w in rng.sample(_WORDS, min(n, len(_WORDS)))
    )
    return f"<ul>{items}</ul>"


def gt_table_html(doc_id: int) -> str:
    """Deterministic span-heavy table for pages where has_table(doc_id).

    Regenerable ground truth for the TEDS pipeline; includes the
    formatting tags the stopword-strip must remove (FIXTURES.md §2).
    """
    rng = _rng(doc_id * 3 + 2)
    nrows = rng.randint(2, 5)
    ncols = rng.randint(2, 4)
    rows = []
    occupied: set[tuple[int, int]] = set()
    for r in range(nrows):
        cells = []
        c = 0
        while c < ncols:
            if (r, c) in occupied:
                c += 1
                continue
            colspan = rowspan = 1
            if rng.random() < 0.2 and c + 1 < ncols and (r, c + 1) not in occupied:
                colspan = 2
            elif rng.random() < 0.15 and r + 1 < nrows:
                rowspan = 2
            for dr in range(rowspan):
                for dc in range(colspan):
                    occupied.add((r + dr, c + dc))
            text = f"v{r}{c}" if rng.random() < 0.8 else f"<b>v{r}{c}</b>"
            attrs = ""
            if colspan > 1:
                attrs += f' colspan="{colspan}"'
            if rowspan > 1:
                attrs += f' rowspan="{rowspan}"'
            tag = "th" if r == 0 and rng.random() < 0.5 else "td"
            cells.append(f"<{tag}{attrs}>{text}</{tag}>")
            c += colspan
        rows.append("<tr>" + "".join(cells) + "</tr>")
    return "<table>" + "".join(rows) + "</table>"


def has_table(doc_id: int) -> bool:
    return doc_id % 5 == 0


def is_heavy(doc_id: int) -> bool:
    """~1/250 pages get heavy boilerplate padding (skew tail)."""
    return doc_id % 250 == 7


def synth_html(doc_id: int, text: str, lang: str) -> bytes:
    """Build the full page. `text` is reproduced exactly by the extractor."""
    rng = _rng(doc_id)
    paragraphs = text.split("\n\n")
    min_words = min(len(p.split()) for p in paragraphs) if paragraphs else 0
    use_article = min_words <= 40 or rng.random() < 0.5
    host = host_for(doc_id)

    title_words = rng.sample(_WORDS, 3)
    parts = [
        "<!DOCTYPE html>",
        f'<html lang="{lang}"><head>',
        f"<title>{' '.join(title_words)} | host{host:04d}</title>",
        '<meta charset="utf-8"><meta name="viewport" content="width=device-width">',
        "<script>var _q=[];window.track=function(e){_q.push(e)};</script>",
        "<style>.nav{display:flex}.ad{color:#888}</style>",
        "</head><body>",
        "<header><h1><a href=\"/\">host%04d.example</a></h1>" % host_for(doc_id),
        "<nav class=\"nav\">", _nav_links(rng, 6), "</nav></header>",
        # cookie banner: link density > 1/3 by construction
        '<div class="cookie">We use cookies. <a href="/privacy">Read our privacy policy here</a></div>',
    ]
    n_pad = 40 if is_heavy(doc_id) else rng.randint(0, 2)
    parts.append('<aside class="sidebar">')
    for _ in range(1 + n_pad):
        parts.append(_nav_links(rng, 8))
    parts.append("</aside>")

    if use_article:
        parts.append("<article>")
    else:
        parts.append('<div class="content">')
    table_pos = rng.randrange(len(paragraphs) + 1) if has_table(doc_id) else -1
    for i, para in enumerate(paragraphs):
        if i == table_pos:
            parts.append(gt_table_html(doc_id))
        # seeded inline formatting on a long paragraph: wrap one word.
        # The wrap slices the RAW text at a word boundary and escapes the
        # three segments independently — substring-replacing inside the
        # already-escaped body could split an entity (e.g. target "amp"
        # inside "&amp;") and break the byte-identical contract.
        body = None
        wtoks = para.split()
        if len(wtoks) > 8 and rng.random() < 0.5:
            target = wtoks[rng.randrange(2, len(wtoks) - 2)]
            tag = rng.choice(("b", "i", "em"))
            m = _re.search(rf"(?<!\S){_re.escape(target)}(?!\S)", para)
            if m:
                body = (escape(para[:m.start()], quote=False)
                        + f"<{tag}>{escape(target, quote=False)}</{tag}>"
                        + escape(para[m.end():], quote=False))
        if body is None:
            body = escape(para, quote=False)
        parts.append(f"<p>{body}</p>")
    if table_pos == len(paragraphs):
        parts.append(gt_table_html(doc_id))
    parts.append("</article>" if use_article else "</div>")

    parts.append('<div class="related"><ul>')
    for w in rng.sample(_WORDS, 5):
        parts.append(f'<li><a href="/{w}/{rng.randrange(999)}">More about {w}</a></li>')
    parts.append("</ul></div>")
    parts.append(f'<footer><p>© 2025 host{host:04d}.example — '
                 f'<a href="/imprint">Imprint</a> <a href="/privacy">Privacy</a></p></footer>')
    parts.append("</body></html>")
    return "\n".join(parts).encode("utf-8")
