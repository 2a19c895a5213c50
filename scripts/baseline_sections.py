"""Shared section splicing for BENCH/BASELINE.md.

Three writers own parts of the file: scaling_evidence.write_baseline_md
regenerates the sequential body, and the two supplementary protocols
(scaling_concurrent, scaling_weak) each own one trailing section. Each
section replace must touch ONLY its own marker..next-heading span so the
writers compose in any order.
"""

from __future__ import annotations


def replace_section(body: str, marker: str, section_text: str) -> str:
    """Replace (or append) the span from `marker` to the next '## ' heading.

    `section_text` must start with the marker line itself. If the marker is
    absent the section is appended at the end."""
    if marker in body:
        start = body.index(marker)
        nxt = body.find("\n## ", start + len(marker))
        tail = body[nxt + 1 :] if nxt != -1 else ""
        body = body[:start].rstrip() + "\n\n" + section_text.rstrip() + "\n"
        if tail:
            body += "\n" + tail
        return body
    return body.rstrip() + "\n\n" + section_text.rstrip() + "\n"
