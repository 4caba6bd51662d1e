"""Native data-loader tests: the C++ packer must produce bit-identical
output to the numpy reference path, and the CSR builder a valid sorted
ordering."""

import numpy as np
import pytest

from gns_tpu.utils import native
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.cases import load_case
from gns_tpu.utils.prepare import _stack_to_batch, prepare_case

needs_native = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="libgridpack.so not built (make -C native)"
)


@needs_native
@pytest.mark.parametrize("case_nr", [9, 14, 300])
def test_pack_batch_bit_identical(case_nr):
    cases = list(generate_cases(case_nr, 5, seed=21))
    ref = _stack_to_batch([prepare_case(c) for c in cases])
    out = native.pack_batch(cases)
    for name, a, b in zip(ref._fields, ref, out):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"field {name} differs"
        )


@needs_native
def test_pack_batch_mixed_padding():
    cases = [load_case(9), load_case(14), load_case(30)]
    ref = _stack_to_batch([prepare_case(c) for c in cases])
    out = native.pack_batch(cases)
    for name, a, b in zip(ref._fields, ref, out):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"field {name} differs"
        )


@needs_native
def test_pack_batch_paper_shunts_flag():
    cases = [load_case(14)]
    ref = _stack_to_batch([prepare_case(c, paper_shunts=False) for c in cases])
    out = native.pack_batch(cases, paper_shunts=False)
    np.testing.assert_array_equal(np.asarray(ref.buses), np.asarray(out.buses))


def test_csr_by_dst_roundtrip():
    buses, lines, gens = prepare_case(load_case(14))
    order, indptr = native.csr_by_dst(lines, buses.shape[0])
    dst = lines[:, 1].astype(np.int32) - 1
    sorted_dst = dst[order]
    assert np.all(np.diff(sorted_dst) >= 0)  # sorted
    assert indptr[0] == 0 and indptr[-1] == lines.shape[0]
    # indptr counts match
    for b in range(buses.shape[0]):
        assert indptr[b + 1] - indptr[b] == (dst == b).sum()
    # stable: original order preserved within a segment
    for b in range(buses.shape[0]):
        seg = order[indptr[b]:indptr[b + 1]]
        assert np.all(np.diff(seg) > 0)


@needs_native
def test_csr_native_matches_numpy():
    buses, lines, gens = prepare_case(load_case(300))
    o1, p1 = native.csr_by_dst(lines, buses.shape[0])
    # force numpy fallback
    lib, native._lib = native._lib, None
    have, native.HAVE_NATIVE = native.HAVE_NATIVE, False
    try:
        import importlib

        dst = lines[:, 1].astype(np.int32) - 1
        order = np.argsort(dst, kind="stable").astype(np.int32)
        indptr = np.zeros(buses.shape[0] + 1, np.int32)
        np.add.at(indptr, dst + 1, 1)
        indptr = np.cumsum(indptr, dtype=np.int32)
        np.testing.assert_array_equal(o1, order)
        np.testing.assert_array_equal(p1, indptr)
    finally:
        native._lib, native.HAVE_NATIVE = lib, have
