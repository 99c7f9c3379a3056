"""Remote threshold-OPRF service example: the HTTP fan-out flow must produce
the same nullifier as the pure in-process protocol (same blind + shares), and
malformed requests must fail as JSON errors, not connection drops.

Mirrors the reference's threshold e2e (js/src/tests/oprf.test.ts:43-110) but
over an actual transport — the deployment shape the reference's in-process
test simulates.
"""
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

from toprf_threshold_service import ShareServer, _post, run_flow

from zksc_tpu.oprf.operator import make_oprf_operator


def test_remote_flow_matches_local():
    import random
    rnd = random.Random(7)
    rng = lambda: rnd.randrange(2, 2**250)

    op = make_oprf_operator(rng=rng)
    keys = op.generate_threshold_keys(5, 3)
    request = op.generate_oprf_request_data(b"user@example.com", "reclaim")

    # local: evaluate directly with each share
    local_responses = []
    for s in keys["shares"][:3]:
        r = op.evaluate_oprf(s["privateKey"], request["maskedData"])
        r["index"] = s["index"]
        r["publicKeyShare"] = s["publicKey"]
        local_responses.append(r)
    local_out = op.finalise_oprf(keys["publicKey"], request, local_responses)

    # remote: same shares behind HTTP servers
    servers = [ShareServer(s).start() for s in keys["shares"][:3]]
    try:
        remote_responses = [
            _post(srv.url + "/evaluate", {"maskedData": request["maskedData"]})
            for srv in servers]
        remote_out = op.finalise_oprf(keys["publicKey"], request,
                                      remote_responses)
    finally:
        for srv in servers:
            srv.shutdown()
            srv.server_close()

    # the protocol is deterministic given the mask: evaluate adds fresh DLEQ
    # nonces but the unmasked OUTPUT depends only on (sk, data), so local and
    # remote must agree bit-for-bit
    assert remote_out["output"] == local_out["output"]


def test_full_flow_smoke():
    out = run_flow(b"someone@mail.test", "demo", total=4, threshold=2,
                   verbose=False)
    assert len(json.loads(json.dumps(out))["output"]) > 0


def test_malformed_request_is_json_error():
    op = make_oprf_operator()
    keys = op.generate_threshold_keys(3, 2)
    srv = ShareServer(keys["shares"][0]).start()
    try:
        req = urllib.request.Request(
            srv.url + "/evaluate",
            data=json.dumps({"maskedData": "AAAA"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        srv.shutdown()
        srv.server_close()
