"""Source hygiene gates: patterns the engine bans in any Arrow kernel.

Cheap greps over the package source keep scale anti-patterns from
creeping back in (VERDICT r2 "What's wrong" #3: per-row pandas
iteration inside kernels).
"""

from __future__ import annotations

import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "dere_spark"


def _grep(pattern: str) -> list[str]:
    hits = []
    for path in sorted(PKG.rglob("*.py")):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if pattern in line:
                hits.append(f"{path.relative_to(PKG.parent)}:{i}: {line.strip()}")
    return hits


def test_no_iterrows_anywhere():
    # pandas.DataFrame.iterrows materializes a Series per row (~100x the
    # cost of itertuples); banned in every kernel, vectorize or itertuples
    assert _grep(".iterrows(") == []


def test_no_rdd_map_in_package():
    # the engine is DataFrame-first: per-row RDD lambdas bypass codegen
    assert _grep(".rdd.map(") == []
