"""Regenerate the static `_GATE_PRIORITY` block in plans/__init__.py
from the derived window (r13 VERDICT task #8).

The derivation (gate_window.build_window over the CORRECTNESS ledger +
`_CHANGED_THIS_ROUND`) has been the source of truth since r12, and
tests/test_gate_window.py fails loudly whenever the static list
diverges — but closing that failure was a manual print-and-paste step.
This script closes it mechanically:

    python scripts/regen_gate_window.py        # rewrite in place
    python scripts/regen_gate_window.py --check  # exit 1 on divergence

Workflow per round: bump `_CURRENT_ROUND`, edit `_CHANGED_THIS_ROUND`,
run this script. The static list in the driver path stays deterministic
and auditable (no import-time ledger dependency); it just can never be
hand-maintained into divergence, because the only way to update it is
this rewrite.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
INIT = REPO / "de_gcp_lakehouse_iceberg_spark" / "plans" / "__init__.py"

_BLOCK_RE = re.compile(
    r"(_GATE_PRIORITY = \[\n)(.*?)(\n\]\n)", re.DOTALL
)


def render(window: list[str]) -> str:
    return "\n".join(f'    "{name}",' for name in window)


def main() -> int:
    sys.path.insert(0, str(REPO))
    from de_gcp_lakehouse_iceberg_spark.plans import _derived_gate_window

    window = _derived_gate_window()
    src = INIT.read_text()
    m = _BLOCK_RE.search(src)
    if not m:
        print("could not locate the _GATE_PRIORITY block", file=sys.stderr)
        return 2
    body = render(window)
    if m.group(2) == body:
        print(f"_GATE_PRIORITY up to date ({len(window)} entries)")
        return 0
    if "--check" in sys.argv[1:]:
        print("_GATE_PRIORITY diverges from the derived window "
              "(run scripts/regen_gate_window.py)", file=sys.stderr)
        return 1
    INIT.write_text(src[: m.start(2)] + body + src[m.end(2):])
    print(f"rewrote _GATE_PRIORITY ({len(window)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
