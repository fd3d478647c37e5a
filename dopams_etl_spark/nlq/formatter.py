"""N6 answer formatting — the deterministic tail of the chatbot loop.

The reference renders query results through narrative/advanced formatters
(``chatbot/agents/nodes.py:87–800``: count answers as sentences, row sets
as bounded tables, errors sanitized). This is that surface as a pure
function over ``NLQAnswer`` — deterministic templates, no LLM in the
path, and the same row-cap discipline as the guarded executor (never
render more than ``max_rows``; say how many were omitted)."""

from __future__ import annotations

from dopams_etl_spark.nlq.generator import NLQAnswer


def format_answer(ans: NLQAnswer, max_rows: int = 10) -> str:
    """Render an NLQAnswer as user-facing text.

    Shapes: failure → sanitized one-liner; single-row single-column →
    sentence; anything else → header + aligned rows, truncated with an
    omission note. Never raises on odd shapes — a formatter that throws
    loses the answer the pipeline already paid for."""
    if not ans.ok or ans.result is None or not ans.result.ok:
        reason = ans.error or (ans.result.error if ans.result else None) or "unknown error"
        return f"Sorry — could not answer ({reason})."
    rows = ans.result.rows
    if not rows:
        return "No matching rows."
    cols = list(rows[0].asDict().keys())
    if len(rows) == 1 and len(cols) == 1:
        return f"{cols[0]} = {rows[0][cols[0]]}"
    shown = rows[:max_rows]
    cells = [[str(r[c]) for c in cols] for r in shown]
    widths = [
        max(len(cols[i]), *(len(row[i]) for row in cells)) for i in range(len(cols))
    ]
    header = " | ".join(c.ljust(w) for c, w in zip(cols, widths))
    sep = "-+-".join("-" * w for w in widths)
    body = "\n".join(" | ".join(v.ljust(w) for v, w in zip(row, widths)) for row in cells)
    out = f"{header}\n{sep}\n{body}"
    omitted = len(rows) - len(shown)
    if omitted > 0 or ans.result.truncated:
        extra = f"{omitted} more row(s) omitted" if omitted else ""
        cap = "result capped by the executor" if ans.result.truncated else ""
        note = "; ".join(x for x in (extra, cap) if x)
        out += f"\n({note})"
    return out
