"""OPRF operator wire-format surface: full threshold flow over the
base64-JSON shapes of the reference FFI (js/src/gnark/toprf.ts +
gnark/libraries/*/oprf/library.go), point/scalar codec round-trips."""
import base64
import random

import pytest

from zksc_tpu.oprf import babyjubjub as bjj
from zksc_tpu.oprf.operator import (
    make_oprf_operator, point_from_bytes, point_to_bytes, scalar_to_bytes,
)


def _rng(seed):
    r = random.Random(seed)
    return lambda: r.randrange(1, bjj.L_ORDER)


def test_point_codec_roundtrip():
    r = random.Random(1)
    for _ in range(10):
        p = bjj.mul(bjj.BASE, r.randrange(1, bjj.L_ORDER))
        enc = point_to_bytes(p)
        assert len(enc) == 32
        assert point_from_bytes(enc) == p
    assert point_from_bytes(point_to_bytes(bjj.IDENTITY)) == bjj.IDENTITY


def test_point_codec_rejects_bad():
    with pytest.raises(ValueError):
        point_from_bytes(b"\x01" * 31)          # wrong length
    # find a y with no matching x (x^2 target is a non-residue)
    from zksc_tpu.oprf.operator import _sqrt_q
    y = 2
    while True:
        num = (1 - y * y) % bjj.Q
        den = (bjj.A - bjj.D * y * y) % bjj.Q
        if _sqrt_q(num * pow(den, -1, bjj.Q) % bjj.Q) is None:
            break
        y += 1
    with pytest.raises(ValueError):
        point_from_bytes(int(y).to_bytes(32, "little"))
    with pytest.raises(ValueError):
        point_from_bytes(b"\xff" * 32)           # non-canonical y


def test_threshold_flow_over_wire():
    """Mirror of js/src/tests/oprf.test.ts:43-110: keygen 5 shares /
    threshold 3, request, per-node evaluate, finalize — every hop through
    the base64 wire shapes."""
    op = make_oprf_operator("chacha20", rng=_rng(7))
    keys = op.generate_threshold_keys(5, 3)
    assert len(keys["shares"]) == 5
    assert {s["index"] for s in keys["shares"]} == {1, 2, 3, 4, 5}

    data = b"user@example.com"
    req = op.generate_oprf_request_data(data, "email-nullifier")
    assert set(req) == {"mask", "maskedData", "secretElements"}

    chosen = keys["shares"][1:4]                 # any 3 of 5
    responses = []
    for sh in chosen:
        r = op.evaluate_oprf(sh["privateKey"], req["maskedData"])
        responses.append({
            "index": sh["index"],
            "publicKeyShare": sh["publicKey"],
            "evaluated": r["evaluated"],
            "c": r["c"],
            "r": r["r"],
        })
    out = op.finalise_oprf(keys["publicKey"], req, responses)
    output = base64.b64decode(out["output"])
    assert len(output) == 32 and any(output)

    # a different share subset must produce the SAME output
    chosen2 = [keys["shares"][0], keys["shares"][2], keys["shares"][4]]
    responses2 = []
    for sh in chosen2:
        r = op.evaluate_oprf(sh["privateKey"], req["maskedData"])
        responses2.append({"index": sh["index"],
                           "publicKeyShare": sh["publicKey"], **r})
    out2 = op.finalise_oprf(keys["publicKey"], req, responses2)
    assert out2["output"] == out["output"]


def test_finalize_rejects_tampered_response():
    op = make_oprf_operator("chacha20", rng=_rng(9))
    keys = op.generate_threshold_keys(3, 2)
    req = op.generate_oprf_request_data(b"secret-value", "ds")
    responses = []
    for sh in keys["shares"][:2]:
        r = op.evaluate_oprf(sh["privateKey"], req["maskedData"])
        responses.append({"index": sh["index"],
                          "publicKeyShare": sh["publicKey"], **r})
    # tamper: swap the evaluated point for a random one
    fake = bjj.mul(bjj.BASE, 12345)
    responses[0]["evaluated"] = base64.b64encode(
        point_to_bytes(fake)).decode()
    with pytest.raises(ValueError, match="DLEQ|reconstruct"):
        op.finalise_oprf(keys["publicKey"], req, responses)


def test_master_private_key_consistent():
    op = make_oprf_operator("chacha20", rng=_rng(4))
    keys = op.generate_threshold_keys(4, 2)
    sk = int.from_bytes(base64.b64decode(keys["privateKey"]), "big")
    pub = point_from_bytes(base64.b64decode(keys["publicKey"]))
    assert bjj.mul(bjj.BASE, sk) == pub
