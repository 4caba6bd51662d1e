"""Data layer tests: prepare_grid unit contract, augmentation statistics,
loader semantics, padding invariants (SURVEY.md §4 'Data tests')."""

import numpy as np
import pytest

from gns_tpu.utils import augment, cases
from gns_tpu.utils.prepare import (
    GridBatch,
    _stack_to_batch,
    base_case_batch,
    prepare_case,
    prepare_grid,
)
from gns_tpu.utils.schema import BUS, GEN, LINE


REF_DATA = "/root/reference/data"


def test_prepare_grid_matches_reference_contract():
    """Unit conversions of GNS/utils.py:17-41 on a shipped pickle."""
    buses, lines, gens = prepare_grid(14, 1, data_dir=REF_DATA)
    assert buses.shape == (14, 6) and lines.shape == (20, 7) and gens.shape == (5, 7)
    # Gs/Bs forced to +-1 then divided by baseMVA=100.
    np.testing.assert_allclose(buses[:, BUS["Gs"]], 0.01)
    np.testing.assert_allclose(buses[:, BUS["Bs"]], -0.01)
    # tau has no zeros (0 -> 1 mapping).
    assert np.all(lines[:, LINE["tau"]] != 0)
    # theta_shift is radians: augmentation draws degrees in [-0.2, 0.2].
    assert np.all(np.abs(lines[:, LINE["theta"]]) <= np.deg2rad(0.2) + 1e-7)
    # Pg duplicated into Pg_set and Pg.
    np.testing.assert_array_equal(gens[:, GEN["Pg_set"]], gens[:, GEN["Pg"]])


def test_case_tables_sizes():
    for nr, (n, e, g) in cases.CASE_SIZES.items():
        c = cases.load_case(nr)
        assert c["bus"].shape[0] == n
        assert c["branch"].shape[0] == e
        assert c["gen"].shape[0] == g
        # exactly one slack bus
        assert (c["bus"][:, 1] == 3).sum() == 1
        # all branch endpoints are valid 1-based bus ids
        assert c["branch"][:, :2].min() >= 1
        assert c["branch"][:, :2].max() <= n


def test_synthetic_cases_connected():
    import networkx as nx

    for nr in (30, 118, 300):
        c = cases.load_case(nr)
        gph = nx.Graph()
        gph.add_nodes_from(range(1, c["bus"].shape[0] + 1))
        gph.add_edges_from(c["branch"][:, :2].astype(int).tolist())
        assert nx.is_connected(gph), f"case{nr} synthetic grid not connected"


def test_renumber_case_preserves_solution():
    """renumber_case (pypower ext2int analog): scrambling case14's bus ids
    to a sparse numbering and renumbering back to 1..N must leave the
    power-flow solution identical — the drop-in path for authentic
    non-consecutively-numbered tables (real pypower case300)."""
    from gns_tpu.eval.newton_raphson import newton_raphson_pf

    base = cases.load_case(14)
    ref = newton_raphson_pf(base)

    # scramble: bus i -> 10*i + 3 (sparse, order-preserving)
    import copy

    scr = copy.deepcopy(base)
    scr["bus"] = np.asarray(scr["bus"], float).copy()
    scr["gen"] = np.asarray(scr["gen"], float).copy()
    scr["branch"] = np.asarray(scr["branch"], float).copy()
    f = lambda c: 10.0 * c + 3.0
    scr["bus"][:, 0] = f(scr["bus"][:, 0])
    scr["gen"][:, 0] = f(scr["gen"][:, 0])
    scr["branch"][:, 0] = f(scr["branch"][:, 0])
    scr["branch"][:, 1] = f(scr["branch"][:, 1])

    fixed = cases.renumber_case(scr)
    assert np.array_equal(
        np.asarray(fixed["bus"])[:, 0], np.arange(1, 15)
    )
    got = newton_raphson_pf(fixed)
    assert got.success
    np.testing.assert_allclose(got.vm, ref.vm, atol=1e-9)
    np.testing.assert_allclose(got.va_deg, ref.va_deg, atol=1e-7)
    # idempotent on already-consecutive tables
    again = cases.renumber_case(fixed)
    np.testing.assert_array_equal(again["bus"], fixed["bus"])


def test_case30_reproduces_published_solution():
    """The shipped case30 is the canonical IEEE 30-bus network: NR from
    flat start must reproduce the published solution — total losses
    17.557 MW, slack ~260.96 MW on the 283.4 MW load (whole-table
    checksum; see gns_tpu/utils/cases.py docstring)."""
    from gns_tpu.eval.newton_raphson import newton_raphson_pf

    c = cases.load_case(30)
    assert abs(c["bus"][:, 2].sum() - 283.4) < 1e-9
    res = newton_raphson_pf(c)
    assert res.success and res.iterations <= 5
    losses = res.gen[:, 1].sum() - c["bus"][:, 2].sum()
    assert abs(losses - 17.557) < 5e-3, losses
    assert abs(res.gen[0, 1] - 260.96) < 0.05
    assert abs(res.vm[-1] - 0.992) < 1e-3


def test_augment_semantics():
    """Perturbation families of augment_grids.py:25-54 under a fixed seed."""
    base = cases.load_case(14)
    rng = np.random.default_rng(42)
    aug = augment.augment_case(base, rng)
    b0, a0 = base["branch"], aug["branch"]
    # r/x/b scaled within +-10% (skip r==0 transformer branches: 0*u == 0)
    nz = b0[:, 2] != 0
    r_ratio = a0[nz, 2] / b0[nz, 2]
    assert np.all((r_ratio >= 0.9) & (r_ratio <= 1.1))
    assert np.all(a0[~nz, 2] == 0)
    # tau absolute in [0.8, 1.2]; shift absolute in [-0.2, 0.2]
    assert np.all((a0[:, 8] >= 0.8) & (a0[:, 8] <= 1.2))
    assert np.all(np.abs(a0[:, 9]) <= 0.2)
    # load rebalance: sum(Pd) == sum(Pg) (augment_grids.py:51)
    np.testing.assert_allclose(aug["bus"][:, 2].sum(), aug["gen"][:, 1].sum(), rtol=1e-10)
    # determinism
    aug2 = augment.augment_case(base, np.random.default_rng(42))
    np.testing.assert_array_equal(aug["branch"], aug2["branch"])


def test_generate_dataset_roundtrip(tmp_path):
    out = augment.generate_dataset(14, num_augmentations=3, seed=7, data_dir=str(tmp_path))
    buses, lines, gens = prepare_grid(14, 2, data_dir=str(tmp_path))
    assert buses.shape == (14, 6)
    from gns_tpu.utils.prepare import load_all_grids, load_prepared

    batch = load_all_grids(14, nr_samples=3, data_dir=str(tmp_path), total_grids=4)
    assert batch.batch_size == 3
    fast = load_prepared(14, nr_samples=3, data_dir=str(tmp_path))
    np.testing.assert_array_equal(batch.buses, fast.buses)
    np.testing.assert_array_equal(batch.lines, fast.lines)
    np.testing.assert_array_equal(batch.generators, fast.generators)


def test_padded_mixed_batch():
    """Mixed-size grids pad to a common bucket with valid masks and E>=N."""
    triples = [
        prepare_case(cases.load_case(9)),
        prepare_case(cases.load_case(14)),
        prepare_case(cases.load_case(30)),
    ]
    batch = _stack_to_batch(triples)
    s, n, _ = batch.buses.shape
    e = batch.lines.shape[1]
    assert s == 3 and n == 30 and e >= n
    np.testing.assert_array_equal(batch.n_bus, [9, 14, 30])
    # masks
    assert batch.bus_mask[0].sum() == 9 and batch.bus_mask[2].sum() == 30
    assert batch.line_mask[1].sum() == 20
    # padded line endpoints point at the dead (last) bus slot, 1-based
    assert np.all(batch.lines[0, 9:, 0] == n)
    assert np.all(batch.lines[0, 9:, 1] == n)
    # padded lines have tau=1 (never divide by zero)
    assert np.all(batch.lines[0, 9:, 5] == 1.0)


def test_base_case_batch_all_cases():
    for nr in cases.CASE_SIZES:
        b = base_case_batch(nr)
        assert isinstance(b, GridBatch)
        assert b.batch_size == 1


def test_augment_scale_one_is_reference_recipe():
    """scale=1.0 must consume the same RNG stream and produce the same
    draws as the reference recipe (augment_grids.py:28-54)."""
    import copy

    base = cases.load_case(30)
    a = augment.augment_case(copy.deepcopy(base), np.random.default_rng(7))
    b = augment.augment_case(copy.deepcopy(base), np.random.default_rng(7),
                             scale=1.0)
    for k in ("bus", "branch", "gen"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_augment_scale_shrinks_perturbation():
    """scale -> 0 approaches the base case (tau -> 1, shift -> 0, Pg/loads
    near base)."""
    import copy

    base = cases.load_case(30)
    c = augment.augment_case(copy.deepcopy(base), np.random.default_rng(0),
                             scale=0.01)
    br = np.asarray(c["branch"])
    assert np.abs(br[:, 8] - 1.0).max() < 0.01  # tau ~ 1
    assert np.abs(br[:, 9]).max() < 0.01  # shift ~ 0
    # rebalance keeps sum Pd == sum Pg (reference invariant, at any scale)
    assert abs(np.asarray(c["bus"])[:, 2].sum()
               - np.asarray(c["gen"])[:, 1].sum()) < 1e-9


def test_feasible_only_generation():
    """feasible_only rejection-samples to NR-convergent grids; case300 at
    the reference's full perturbation strength is essentially never
    solvable (why the option exists), at scale=0.5 it is."""
    from gns_tpu.eval.newton_raphson import newton_raphson_pf

    got = list(augment.generate_cases(118, 4, seed=1, feasible_only=True))[1:]
    assert all(newton_raphson_pf(c).success for c in got)
    got = list(augment.generate_cases(300, 2, seed=1, feasible_only=True,
                                      scale=0.5))[1:]
    assert all(newton_raphson_pf(c).success for c in got)
