"""Doctags parse/serialize (F19): the token-tag document format.

Parity target: the reference consumes doctags files — element-per-line
token strings `<label><loc_l><loc_t><loc_r><loc_b>text</label>` inside a
`<doctag>` envelope (docling_eval/evaluators/base_evaluator.py:42-62 +
evaluators/adapters.py:57-65 feed them to DoclingDocument; sample corpus
tests/data/doclaynet_v1_doctags_sample/*.dt). This is a from-scratch
parser for that surface syntax producing flat span rows — the engine's
native layout representation — plus the inverse serializer used to build
deterministic fixtures.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ELEMENT = re.compile(
    r"<([a-z_][a-z0-9_]*)>"
    r"<loc_(\d+)><loc_(\d+)><loc_(\d+)><loc_(\d+)>"
    r"(.*?)"
    r"</\1>",
    re.S,
)


@dataclass
class DocTagSpan:
    label: str
    l: int
    t: int
    r: int
    b: int
    text: str


def parse_doctags(s: str) -> list[DocTagSpan]:
    """Doctags string -> span list (document order). Tolerates the
    `<doctag>` envelope, inter-element whitespace, and unknown labels;
    malformed elements are skipped rather than raising (the reference's
    adapters also parse leniently)."""
    return [
        DocTagSpan(m.group(1), int(m.group(2)), int(m.group(3)),
                   int(m.group(4)), int(m.group(5)), m.group(6))
        for m in _ELEMENT.finditer(s)
        if m.group(1) != "doctag"
    ]


def to_doctags(spans: list[DocTagSpan]) -> str:
    body = "\n".join(
        f"<{s.label}><loc_{s.l}><loc_{s.t}><loc_{s.r}><loc_{s.b}>"
        f"{s.text}</{s.label}>"
        for s in spans
    )
    return f"<doctag>{body}\n</doctag>"
