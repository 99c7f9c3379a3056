"""In-circuit TOPRF gadget tests: witness satisfaction against the host OPRF
protocol (mirrors the reference's gnark circuit tests for
gnark/circuits/toprf/toprf.go — TestTOPRF in testdata flow)."""
import random

from zksc_tpu.oprf import babyjubjub as bjj
from zksc_tpu.oprf import oprf
from zksc_tpu.r1cs import builder
from zksc_tpu.r1cs.circuits import toprf


SECRET = b"test secret value 123"
DOMAIN = b"reclaim"


def _host_toprf_data(seed=1234):
    """Run the host protocol end-to-end: keys, request, evaluate, finalize."""
    rng = random.Random(seed)
    r = lambda: rng.randrange(1, bjj.L_ORDER)
    master_pub, shares = oprf.generate_threshold_keys(
        n=1, threshold=toprf.THRESHOLD, rng=r)
    req = oprf.generate_request(SECRET, rng=r, domain_separator=DOMAIN)
    responses = {s.index: oprf.evaluate(s.secret, req.masked_point, rng=r)
                 for s in shares}
    out = oprf.threshold_finalize(req, responses, server_public=master_pub)
    return req, responses, sorted(responses), out


def _gadget_layouts():
    pub = list(toprf.TOPRF_PUBLIC_LAYOUT)
    priv = list(toprf.TOPRF_PRIVATE_LAYOUT) + [("s", 2)]
    return pub, priv


def _define(api, v):
    params = toprf.params_from_vars(v)
    toprf.verify_toprf(api, params, v["s"][0], v["s"][1])


def _witness_values(req, responses, indices, out):
    pub, priv = toprf.toprf_witness_values(DOMAIN, req, responses, indices,
                                           out, batch=1)
    priv["s"] = [[req.secret_elements[0]], [req.secret_elements[1]]]
    return pub, priv


def test_toprf_gadget_satisfied():
    req, responses, indices, out = _host_toprf_data()
    pub_layout, priv_layout = _gadget_layouts()
    cs = builder.compile_circuit(_define, pub_layout, priv_layout)
    pub, priv = _witness_values(req, responses, indices, out)
    w = builder.generate_witness(_define, pub_layout, priv_layout,
                                 pub, priv, batch=1)
    assert builder.check_witness(cs, w)


def test_toprf_gadget_rejects_wrong_output():
    req, responses, indices, out = _host_toprf_data(seed=99)
    pub_layout, priv_layout = _gadget_layouts()
    cs = builder.compile_circuit(_define, pub_layout, priv_layout)
    pub, priv = _witness_values(req, responses, indices, (out + 1) % bjj.Q)
    w = builder.generate_witness(_define, pub_layout, priv_layout,
                                 pub, priv, batch=1)
    assert not builder.check_witness(cs, w)


def test_toprf_gadget_rejects_wrong_mask():
    req, responses, indices, out = _host_toprf_data(seed=7)
    pub_layout, priv_layout = _gadget_layouts()
    cs = builder.compile_circuit(_define, pub_layout, priv_layout)
    pub, priv = _witness_values(req, responses, indices, out)
    priv["toprf_mask"] = [[(req.mask + 1) % bjj.L_ORDER]]
    try:
        w = builder.generate_witness(_define, pub_layout, priv_layout,
                                     pub, priv, batch=1)
    except (AssertionError, ValueError):
        return  # hint rejected the inconsistent witness: also a pass
    assert not builder.check_witness(cs, w)


def _extract_define(n_bits):
    def define(api, v):
        s0, s1 = toprf.extract_secret_elements(
            api, v["bits"], v["bitmask"], v["len"][0])
        api.assert_eq(s0, v["expect"][0])
        api.assert_eq(s1, v["expect"][1])
    return define


def test_extract_secret_elements():
    # 64 bytes of "ciphertext" bits (LSB-first per byte); mask out the
    # SECRET's bytes at an offset.
    rng = random.Random(5)
    stream = bytearray(rng.randrange(256) for _ in range(64))
    off = 11
    stream[off:off + len(SECRET)] = SECRET
    bits = [(stream[i // 8] >> (i % 8)) & 1 for i in range(512)]
    mask = [1 if off * 8 <= i < (off + len(SECRET)) * 8 else 0
            for i in range(512)]
    s0, s1 = oprf.split_secret_elements(SECRET)

    pub_layout = [("bitmask", 512), ("len", 1), ("expect", 2)]
    priv_layout = [("bits", 512)]
    define = _extract_define(512)
    cs = builder.compile_circuit(define, pub_layout, priv_layout)
    pub = {"bitmask": [[m] for m in mask], "len": [[len(SECRET)]],
           "expect": [[s0], [s1]]}
    priv = {"bits": [[b] for b in bits]}
    w = builder.generate_witness(define, pub_layout, priv_layout,
                                 pub, priv, batch=1)
    assert builder.check_witness(cs, w)

    # wrong claimed length must fail
    pub_bad = dict(pub, len=[[len(SECRET) + 1]])
    w2 = builder.generate_witness(define, pub_layout, priv_layout,
                                  pub_bad, priv, batch=1)
    assert not builder.check_witness(cs, w2)
