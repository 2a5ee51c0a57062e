"""Markdown export: labeled span rows -> deterministic markdown string.

Parity target: reference docling_eval/evaluators/markdown_text_evaluator.py
:83-105,241-251 — `export_to_markdown` with a label whitelist and image
placeholders. The rebuild is a pure string builder over (label, text) span
rows in reading order:

    title          -> "# " + text
    section_header -> "## " + text
    text/paragraph -> text
    list_item      -> "- " + text
    code           -> "```\n" + text + "\n```"
    picture        -> "<!-- image -->"        (placeholder, :104)
    caption        -> text
    (labels outside the whitelist are dropped, like the reference's
     19-label main-text whitelist :85-103)

blocks joined with "\n\n". Deterministic: bytes in -> exact bytes out;
usable inside any Arrow batch (pure function) or as a driver-side export.
"""

from __future__ import annotations

WHITELIST = {
    "title", "section_header", "text", "paragraph", "list_item",
    "code", "picture", "caption", "footnote", "formula",
}


def span_to_markdown(label: str, text: str) -> str | None:
    if label not in WHITELIST:
        return None
    if label == "title":
        return f"# {text}"
    if label == "section_header":
        return f"## {text}"
    if label == "list_item":
        return f"- {text}"
    if label == "code":
        return f"```\n{text}\n```"
    if label == "picture":
        return "<!-- image -->"
    return text


def spans_to_markdown(spans: list[tuple[str, str]]) -> str:
    """[(label, text)] in reading order -> markdown document."""
    parts = [md for label, text in spans
             if (md := span_to_markdown(label, text)) is not None]
    return "\n\n".join(parts)
