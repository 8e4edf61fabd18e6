"""REGISTRY.md drift check: every live registry query must appear in
the generated index (and no ghost rows may linger). Timing columns are
informational and don't gate — only the name set does, so a bench
refresh never fails this while a forgotten `tools/gen_registry.py`
after adding/removing a query does."""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_md_matches_live_registry():
    from bigdata_spark.plans import all_queries

    path = os.path.join(ROOT, "REGISTRY.md")
    assert os.path.exists(path), "run: python tools/gen_registry.py"
    with open(path) as f:
        text = f.read()
    documented = set(re.findall(r"^\| (\w+) \| `", text, flags=re.M))
    live = set(all_queries())
    missing = sorted(live - documented)
    ghost = sorted(documented - live)
    assert not missing and not ghost, (
        f"REGISTRY.md drift — missing: {missing} ghost: {ghost}; "
        "run: python tools/gen_registry.py"
    )
