"""Artifact fetch layer: local/remote fetchers, retry/backoff, SHA-256
pinning, mirroring (reference behavior: js/src/file-fetch.ts:25-87)."""
import hashlib
import io
import os

import pytest

from zksc_tpu import file_fetch as ff


class FakeResponse(io.BytesIO):
    status = 200

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_local_fetch(tmp_path):
    d = tmp_path / "store" / "groth16"
    d.mkdir(parents=True)
    (d / "pk.bin").write_bytes(b"hello")
    fetch = ff.make_local_file_fetch(str(tmp_path / "store"))
    assert fetch("groth16", "pk.bin") == b"hello"
    with pytest.raises(ff.FetchError):
        fetch("groth16", "missing.bin")


def test_remote_fetch_retries_then_succeeds():
    calls = []

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        if len(calls) < 3:
            raise OSError("connection reset")
        return FakeResponse(b"artifact-bytes")

    fetch = ff.make_remote_file_fetch("https://pin.example/v1",
                                      backoff_s=0.0, _urlopen=fake_urlopen)
    data = fetch("gnark", "pk.chacha20")
    assert data == b"artifact-bytes"
    assert len(calls) == 3
    assert calls[0] == "https://pin.example/v1/gnark/pk.chacha20"


def test_remote_fetch_exhausts_retries():
    def fake_urlopen(url, timeout=None):
        raise OSError("no route")

    fetch = ff.make_remote_file_fetch("https://pin.example/v1",
                                      backoff_s=0.0, _urlopen=fake_urlopen)
    with pytest.raises(ff.FetchError, match="after 3 attempts"):
        fetch("gnark", "pk.chacha20")


def test_pinned_fetch_checks_sha256(tmp_path):
    d = tmp_path / "snarkjs"
    d.mkdir()
    (d / "a.zkey").write_bytes(b"zkey-data")
    fetch = ff.make_local_file_fetch(str(tmp_path))
    pin = hashlib.sha256(b"zkey-data").hexdigest()
    assert ff.fetch_pinned(fetch, "snarkjs", "a.zkey", pin) == b"zkey-data"
    with pytest.raises(ff.FetchError, match="integrity pin mismatch"):
        ff.fetch_pinned(fetch, "snarkjs", "a.zkey", "00" * 32)


def test_mirror_artifacts(tmp_path):
    src = tmp_path / "src" / "gnark"
    src.mkdir(parents=True)
    (src / "vk.bin").write_bytes(b"vk")
    (src / "pk.bin").write_bytes(b"pk")
    fetch = ff.make_local_file_fetch(str(tmp_path / "src"))
    manifest = {"gnark": {
        "vk.bin": hashlib.sha256(b"vk").hexdigest(),
        "pk.bin": hashlib.sha256(b"pk").hexdigest(),
    }}
    dest = tmp_path / "dst"
    written = ff.mirror_artifacts(fetch, manifest, str(dest))
    assert len(written) == 2
    assert (dest / "gnark" / "vk.bin").read_bytes() == b"vk"


def test_logger_and_trace_span(capsys, monkeypatch):
    from zksc_tpu.utils.logging import Logger, default_logger, trace_span
    import json
    import sys
    log = Logger(min_level="info", stream=sys.stderr)
    log.debug("hidden")
    log.info("shown", n=3)
    err = capsys.readouterr().err
    assert "hidden" not in err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["msg"] == "shown" and rec["n"] == 3

    monkeypatch.delenv("ZKSC_TRACE_DIR", raising=False)
    monkeypatch.setenv("ZKSC_LOG", "debug")
    with trace_span("unit-span", x=1):
        pass
    err = capsys.readouterr().err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["span"] == "unit-span" and "seconds" in rec


def test_artifacts_cli_publish_roundtrip(tmp_path):
    """publish zips tree+manifest; download --from-dir of the unzipped tree
    reproduces it byte-for-byte (script parity: js/src/scripts)."""
    import json
    import sys
    import zipfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import artifacts_cli

    root = tmp_path / "artifacts"
    (root / "groth16").mkdir(parents=True)
    (root / "groth16" / "vk.json").write_bytes(b'{"vk": 1}')
    (root / "stark").mkdir()
    (root / "stark" / "params.bin").write_bytes(b"\x00\x01\x02")

    out = tmp_path / "release.zip"
    manifest = artifacts_cli.publish(str(root), str(out))
    assert set(manifest) == {"groth16", "stark"}

    unpacked = tmp_path / "unpacked"
    with zipfile.ZipFile(out) as z:
        z.extractall(unpacked)
    shipped = json.loads((unpacked / "manifest.json").read_text())
    assert shipped == manifest
    # mirror from the unpacked release with hash verification
    rc = artifacts_cli.main([
        "download", "--manifest", str(unpacked / "manifest.json"),
        "--dest", str(tmp_path / "mirror"), "--from-dir", str(unpacked)])
    assert rc == 0
    assert (tmp_path / "mirror" / "groth16" / "vk.json").read_bytes() \
        == b'{"vk": 1}'
