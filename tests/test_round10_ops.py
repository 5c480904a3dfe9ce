"""Round-10 pins: the corpus-adaptive flat-IVF sizing rules.

The round-9 verdict measured the fixed-k flat IVF tier at 2.3x WORSE
than brute force at sf10 (probed mass was a 60% corpus fraction).
Round 10 made the cell count corpus-adaptive — k = max(floor,
ceil(sqrt(n))), nprobe = max(legacy, ceil(k/6)) — with the identical
integers recomputed inside the DuckDB oracle as a scalar-subquery
spine. These tests pin (a) the Python formula at its boundaries and
(b) exact Python<->DuckDB integer parity across five decades of n, so
a future edit to either side cannot silently diverge the oracle from
the engine.
"""

from __future__ import annotations

import math

import duckdb

from spark_rapids_ml_spark.operators.similarity import (
    IVF_CELL_FLOOR,
    IVF_NPROBE,
    IVF_PROBE_DEN,
    SQL_IVF_KC,
    SQL_IVF_NPROBE,
    ivf_n_cells,
    ivf_nprobe,
)


def test_ivf_adaptive_cell_formula_boundaries():
    # floor binds up to floor^2 (k-means stays tractable on tiny corpora)
    assert ivf_n_cells(1) == IVF_CELL_FLOOR
    assert ivf_n_cells(IVF_CELL_FLOOR**2) == IVF_CELL_FLOOR
    # first n past the floor's square grows the grid
    assert ivf_n_cells(IVF_CELL_FLOOR**2 + 1) == IVF_CELL_FLOOR + 1
    # exact squares: k = sqrt(n) exactly (no ceil overshoot)
    assert ivf_n_cells(400) == 20
    # the declared test-data decades
    assert ivf_n_cells(2_000) == 45  # sf0.1
    assert ivf_n_cells(20_000) == 142  # sf1
    assert ivf_n_cells(200_000) == 448  # sf10
    # probed mass stays ~1/IVF_PROBE_DEN of cells, floored at legacy
    assert ivf_nprobe(IVF_CELL_FLOOR) == IVF_NPROBE
    assert ivf_nprobe(448) == math.ceil(448 / IVF_PROBE_DEN)


def test_ivf_probed_fraction_shrinks_with_corpus():
    """The round-9 defect in one inequality: the probed corpus fraction
    (nprobe/k ~= fraction of vectors scored) must DECREASE as the
    corpus grows once the floor stops binding — fixed k=10 kept it at
    60% forever."""
    fracs = [
        ivf_nprobe(ivf_n_cells(n)) / ivf_n_cells(n)
        for n in (2_000, 20_000, 200_000, 2_000_000)
    ]
    assert all(a >= b for a, b in zip(fracs, fracs[1:]))
    # and at the biggest measured decade it is far below the old 60%
    assert fracs[2] <= 0.20


def test_ivf_formula_duckdb_parity_across_decades():
    """GREATEST/CEIL/SQRT/`//` in DuckDB must produce bit-identical
    integers to the Python helpers for every corpus size the engine
    will meet — including adversarial near-square n where a float
    sqrt could round either way."""
    con = duckdb.connect()
    sizes = [1, 99, 100, 101, 400, 401, 2_000, 20_000, 200_000,
             2_000_000, 10**9, 44**2, 44**2 + 1, 448**2 - 1]
    for n in sizes:
        # the oracle spine verbatim, with the corpus CTE `e` stubbed to n rows
        row = con.execute(
            f"WITH e AS (SELECT * FROM range({n})), {SQL_IVF_KC} "
            f"SELECT k, {SQL_IVF_NPROBE} FROM kc"
        ).fetchone()
        assert row[0] == ivf_n_cells(n), f"k mismatch at n={n}"
        assert row[1] == ivf_nprobe(ivf_n_cells(n)), f"nprobe mismatch at n={n}"
