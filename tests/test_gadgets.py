"""General gadget library: IndexSelector / Typecast / IsZero
(role of circom/circuits/helper_functions.circom, re-designed for the dual
R1CS/witness builder)."""
import numpy as np
import pytest

from zksc_tpu.r1cs import check_witness, compile_circuit, generate_witness
from zksc_tpu.r1cs.builder import FIELD_R
from zksc_tpu.r1cs.gadgets import index_select, is_zero, typecast

PUB = [("out", 1)]
PRIV = [("idx", 1), ("arr", 4)]


def define(api, v):
    idx = v["idx"][0]
    sel = index_select(api, list(v["arr"]), idx)
    # typecast round-trip: 1x32-bit word -> 4 bytes -> repack
    bytes_ = typecast(api, [sel], 32, 8)
    back = typecast(api, bytes_, 8, 32)[0]
    api.assert_eq(back, sel)
    # is_zero sanity folded in: z(idx) must equal 1 - idx for idx in {0,1}
    api.assert_bool(is_zero(api, idx))
    api.assert_eq(api.add(back, api.constant(0)), v["out"][0])


@pytest.fixture(scope="module")
def cs():
    return compile_circuit(define, PUB, PRIV)


def _wit(cs, idx, arr):
    out = arr[idx] if 0 <= idx < 4 else 0
    w = generate_witness(define, PUB, PRIV, {"out": [[out]]},
                         {"idx": [[idx]], "arr": [[a] for a in arr]}, batch=1)
    return w


def test_index_select_and_typecast_satisfy(cs):
    arr = [0xDEADBEEF, 7, 0xFFFFFFFF, 12345]
    for idx in range(4):
        w = _wit(cs, idx, arr)
        assert check_witness(cs, w), f"idx={idx}"


def test_out_of_range_index_rejected(cs):
    """idx=5: every selector is 0, so the sum==1 constraint must fail."""
    arr = [1, 2, 3, 4]
    w = _wit(cs, 5, arr)
    assert not check_witness(cs, w)


def test_wrong_output_rejected(cs):
    arr = [10, 20, 30, 40]
    w = _wit(cs, 2, arr)
    # tamper the public output wire (wire 1)
    w = np.array(w, dtype=object)
    w[1] = (int(w[1, 0]) + 1) % FIELD_R
    assert not check_witness(cs, w)


def test_batched_witness(cs):
    arr = [5, 6, 7, 8]
    w = generate_witness(
        define, PUB, PRIV,
        {"out": [[6, 8]]},
        {"idx": [[1, 3]], "arr": [[5, 5], [6, 6], [7, 7], [8, 8]]},
        batch=2)
    assert check_witness(cs, w)
