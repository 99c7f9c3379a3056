"""End-to-end *-toprf statement tests (witness level): host OPRF protocol +
cipher + in-circuit TOPRF verification compose to a satisfied R1CS.

Mirrors the reference's OPRF circuit tests (gnark oprf e2e flow:
js/src/tests/oprf.test.ts:43-110 — protocol round-trip, then prove)."""
import random

from zksc_tpu import api
from zksc_tpu.config import CONFIG
from zksc_tpu.oprf import oprf
from zksc_tpu.operators import CircuitSpec
from zksc_tpu.r1cs import check_witness

DOMAIN = b"reclaim"


def _make_toprf_signals(plaintext: bytes, pos: int, length: int, seed=42):
    """Run the host TOPRF protocol over the secret bytes of the plaintext."""
    rng = random.Random(seed)
    r = lambda: rng.randrange(1, oprf.L)
    secret = plaintext[pos:pos + length]
    master_pub, shares = oprf.generate_threshold_keys(n=2, threshold=1, rng=r)
    req = oprf.generate_request(secret, rng=r, domain_separator=DOMAIN)
    share = shares[0]
    resp = oprf.evaluate(share.secret, req.masked_point, rng=r)
    out = oprf.threshold_finalize(req, {share.index: resp})
    signals = api.ZKTOPRFPublicSignals(
        locations=[(pos, length)], domain_separator=DOMAIN, output=out,
        responses=[api.TOPRFResponseSignals(
            index=share.index, public_key=resp.public_key,
            evaluated=resp.evaluated, c=resp.dleq.c, r=resp.dleq.r)])
    return signals, req.mask, out


def _roundtrip(algorithm: str, pos: int, length: int):
    cfg = CONFIG[algorithm + "-toprf"]
    rng = random.Random(algorithm)
    key = bytes(rng.randrange(256) for _ in range(cfg.key_size_bytes))
    iv = bytes(rng.randrange(256) for _ in range(cfg.iv_size_bytes))
    plaintext = bytes(rng.randrange(256)
                      for _ in range(cfg.chunk_size_bytes))
    ciphertext = api._decrypt(algorithm, key, iv, cfg.start_counter,
                              plaintext)
    signals, mask, out = _make_toprf_signals(plaintext, pos, length)
    wi = api.generate_zk_witness(algorithm, key, ciphertext, iv,
                                 toprf=signals, mask=mask)
    assert wi.algorithm == algorithm + "-toprf"
    assert wi.plaintext == plaintext
    spec = CircuitSpec(wi.algorithm)
    w = spec.build_witness(wi)
    return spec, w, signals


def test_chacha20_toprf_witness_satisfied():
    spec, w, signals = _roundtrip("chacha20", pos=17, length=21)
    assert check_witness(spec.cs, w[:, None])
    # public prefix must match the verifier's recomputed signals
    cfg = CONFIG["chacha20-toprf"]
    # (verified indirectly by the wrong-output negative below)


def test_chacha20_toprf_rejects_wrong_output():
    spec, w, signals = _roundtrip("chacha20", pos=3, length=40)
    assert check_witness(spec.cs, w[:, None])
    # tamper the public TOPRF output wire: last public input
    w2 = w.copy()
    n_pub = spec.cs.n_public
    w2[n_pub] = (int(w2[n_pub]) + 1) % (2**255)
    assert not check_witness(spec.cs, w2[:, None])


def test_aes128_toprf_witness_satisfied():
    spec, w, _ = _roundtrip("aes-128-ctr", pos=5, length=14)
    assert check_witness(spec.cs, w[:, None])


def test_toprf_public_signals_match_witness():
    """The verifier-side public signal vector must equal the witness's
    public wires (wire 1..n_public)."""
    algorithm = "chacha20"
    cfg = CONFIG[algorithm + "-toprf"]
    rng = random.Random(7)
    key = bytes(rng.randrange(256) for _ in range(cfg.key_size_bytes))
    iv = bytes(rng.randrange(256) for _ in range(cfg.iv_size_bytes))
    plaintext = bytes(rng.randrange(256)
                      for _ in range(cfg.chunk_size_bytes))
    ciphertext = api._decrypt(algorithm, key, iv, cfg.start_counter,
                              plaintext)
    signals, mask, out = _make_toprf_signals(plaintext, 33, 25)
    wi = api.generate_zk_witness(algorithm, key, ciphertext, iv,
                                 toprf=signals, mask=mask)
    spec = CircuitSpec(wi.algorithm)
    w = spec.build_witness(wi)
    pub = api.get_public_signals_toprf(algorithm, ciphertext, iv, signals)
    assert len(pub) == spec.cs.n_public
    assert [int(x) for x in w[1:1 + spec.cs.n_public]] == \
        [int(x) % oprf.bjj.Q for x in pub]
