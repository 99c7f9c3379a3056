"""snarkjs .zkey/.wtns/vkey-JSON codec round-trips (SURVEY.md §2.5 item 8;
the formats the reference's snarkjs operator consumes,
js/src/snarkjs/operator.ts:92-163)."""
import random

import pytest

from zksc_tpu.curve import bn254_host as host
from zksc_tpu.groth16 import ProverContext, setup, verify
from zksc_tpu.interop import snarkjs as sj
from zksc_tpu.r1cs import compile_circuit, generate_witness


_CACHE = {}


def _toy_circuit():
    # one compile+setup per worker process: the XLA:CPU ladder compiles are
    # the entire cost of this file otherwise
    if "toy" in _CACHE:
        return _CACHE["toy"]

    def define(api, v):
        x = v["x"][0]
        out = v["out"][0]
        acc = x
        for _ in range(6):
            acc = api.mul(acc, x)
        api.assert_eq(api.add(acc, api.constant(5)), out)

    cs = compile_circuit(define, [("out", 1)], [("x", 1)])
    rng = random.Random(5)
    pk, vk = setup(cs, rng=lambda: rng.randrange(2, host.R))
    _CACHE["toy"] = (define, cs, pk, vk)
    return _CACHE["toy"]


def test_zkey_round_trip():
    define, cs, pk, vk = _toy_circuit()
    blob = sj.write_zkey(cs, pk, vk)
    z = sj.read_zkey(blob)
    assert z["n_vars"] == cs.n_wires
    assert z["n_public"] == cs.n_public
    assert z["domain_size"] == pk.domain_n
    assert z["alpha_g1"] == pk.alpha_g1
    assert z["beta_g2"] == pk.beta_g2
    assert z["delta_g2"] == pk.delta_g2
    assert z["ic"] == vk.ic
    assert len(z["a_query"]) == cs.n_wires
    assert len(z["c_query"]) == cs.n_wires - cs.n_public - 1
    assert len(z["h_query"]) == pk.domain_n
    # coefficient section carries every A/B term
    n_terms = sum(len(a) + len(b) for a, b, _ in cs.constraints)
    assert len(z["coeffs"]) == n_terms
    m0, k0, w0, v0 = z["coeffs"][0]
    assert (m0, k0) == (0, 0)
    assert v0 == list(cs.constraints[0][0].values())[0] % host.R


def test_zkey_rejects_garbage():
    with pytest.raises(sj.SnarkjsFormatError):
        sj.read_zkey(b"nope" + bytes(32))
    define, cs, pk, vk = _toy_circuit()
    blob = bytearray(sj.write_zkey(cs, pk, vk))
    blob[200] ^= 0xFF      # corrupt inside the groth16 header points
    with pytest.raises(sj.SnarkjsFormatError):
        sj.read_zkey(bytes(blob))


def test_wtns_round_trip():
    define, cs, pk, vk = _toy_circuit()
    x = 3
    out = (pow(x, 7, host.R) + 5) % host.R
    wit = generate_witness(define, [("out", 1)], [("x", 1)],
                           {"out": [[out]]}, {"x": [[x]]}, batch=1)[:, 0]
    blob = sj.write_wtns(wit)
    back = sj.read_wtns(blob)
    assert back == [int(v) % host.R for v in wit]
    assert back[0] == 1


def test_vkey_json_round_trip_and_verify():
    define, cs, pk, vk = _toy_circuit()
    d = sj.vkey_to_json(vk)
    assert d["nPublic"] == cs.n_public
    vk2 = sj.vkey_from_json(d)
    x = 4
    out = (pow(x, 7, host.R) + 5) % host.R
    wit = generate_witness(define, [("out", 1)], [("x", 1)],
                           {"out": [[out]]}, {"x": [[x]]}, batch=1)[:, 0]
    rng = random.Random(9)
    proof = ProverContext(cs, pk).prove(wit, rng=lambda: rng.randrange(host.R))
    # the round-tripped snarkjs-format vkey verifies the proof
    assert verify(vk2, proof, [out])
    assert not verify(vk2, proof, [(out + 1) % host.R])
