"""API.md's code blocks are executable documentation: this test extracts
every ```python fence and runs them in order in one shared namespace, so the
library-surface doc can never drift from the code (a renamed function or
changed signature fails here, not in a user's pipeline)."""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import functions as F

DOC = Path(__file__).resolve().parent.parent / "API.md"
SF = "/root/testdata/sf0.001"

_FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks() -> list[str]:
    blocks = _FENCE.findall(DOC.read_text())
    assert len(blocks) >= 10, "API.md lost its executable examples"
    return blocks


def test_api_doc_blocks_execute(spark):
    ns: dict = {"spark": spark, "SF": SF, "F": F}
    for i, block in enumerate(_blocks()):
        try:
            exec(compile(block, f"API.md[block {i}]", "exec"), ns)
        except Exception as exc:  # pragma: no cover - failure reporting only
            raise AssertionError(
                f"API.md block {i} failed: {exc}\n--- block ---\n{block}"
            ) from exc
