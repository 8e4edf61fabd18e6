"""REGISTRY.md drift check: every live registry query must appear in
the generated index (and no ghost rows may linger). Timing columns are
informational and don't gate — only the name set does, so a bench
refresh never fails this while a forgotten `tools/gen_registry.py`
after adding/removing a query does."""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_covers_every_registry_query():
    """README coverage-map drift check (the r5/r6 rot class): every
    live registry query must be mentioned by name somewhere in
    README.md, and no query-count claim in the prose may disagree with
    the live registry size."""
    from bigdata_spark.plans import all_queries

    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    live = set(all_queries())
    ticked = set(re.findall(r"`([a-z0-9_]+)`", text))
    missing = sorted(live - ticked)
    assert not missing, (
        f"README.md coverage map is missing registry queries: {missing}; "
        "add a coverage-map row for each"
    )
    claims = re.findall(r"(\d+)-query registry", text) + re.findall(
        r"registry \((\d+) queries", text
    )
    for claim in claims:
        assert int(claim) == len(live), (
            f"README.md claims a {claim}-query registry but the live "
            f"registry has {len(live)} — update the stale count"
        )


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


def test_bench_exclusions_documented_in_bench_notes():
    """VERDICT r7 #8: the bench excluded-list must match BENCH_NOTES.md's
    documented set exactly — no undocumented exclusion drift."""
    import bench

    path = os.path.join(ROOT, "BENCH_NOTES.md")
    with open(path) as f:
        text = f.read()
    m = re.search(
        r"### Bench exclusions \(drift-checked\)\n(.*?)(?:\n### |\n## |\Z)",
        text,
        flags=re.S,
    )
    assert m, "BENCH_NOTES.md lost its '### Bench exclusions' section"
    documented = set(re.findall(r"^- `(\w+)`", m.group(1), flags=re.M))
    live = set(bench.EXCLUDED)
    undocumented = sorted(live - documented)
    ghost = sorted(documented - live)
    assert not undocumented and not ghost, (
        f"bench exclusion drift — undocumented: {undocumented} "
        f"ghost: {ghost}; update BENCH_NOTES.md '### Bench exclusions'"
    )
    # every excluded name must still be a live registry member (gate-only)
    from bigdata_spark.plans import all_queries

    assert live <= set(all_queries())
