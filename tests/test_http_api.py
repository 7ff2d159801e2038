"""HTTP serving API: real socket round-trip against a stub engine."""

import base64
import json
import struct
import threading
import urllib.request

import numpy as np

from vits_tpu.serve.http_api import make_handler, wav_bytes
from http.server import ThreadingHTTPServer


class StubEngine:
    sampling_rate = 22050

    def synthesize(self, text, speaker_id=0, seed=0, scope_shift=0,
                   duration=1.0):
        t = np.linspace(0, 0.05, 1103, dtype=np.float32)
        audio = 0.5 * np.sin(2 * np.pi * (220 + 10 * speaker_id) * t)
        return f"ipa({text})", (self.sampling_rate, audio)


def _server():
    srv = ThreadingHTTPServer(("localhost", 0), make_handler(StubEngine()))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def test_wav_bytes_header():
    wav = wav_bytes(22050, np.zeros(100, np.float32))
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    (sr,) = struct.unpack("<I", wav[24:28])
    assert sr == 22050
    assert len(wav) == 44 + 200  # header + 100 pcm16 samples


def test_health_and_synthesize_roundtrip():
    srv, port = _server()
    try:
        with urllib.request.urlopen(f"http://localhost:{port}/health") as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["sampling_rate"] == 22050

        body = json.dumps({"text": "[EN]hi[EN]", "speaker_id": 2}).encode()
        req = urllib.request.Request(
            f"http://localhost:{port}/synthesize", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            wav = r.read()
        assert wav[:4] == b"RIFF" and len(wav) == 44 + 1103 * 2

        body = json.dumps({"text": "[EN]hi[EN]", "format": "json"}).encode()
        req = urllib.request.Request(
            f"http://localhost:{port}/synthesize", data=body)
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["ipa"] == "ipa([EN]hi[EN])"
        assert out["num_samples"] == 1103
        assert base64.b64decode(out["wav_base64"])[:4] == b"RIFF"
    finally:
        srv.shutdown()


def test_error_paths():
    srv, port = _server()
    try:
        import urllib.error

        req = urllib.request.Request(
            f"http://localhost:{port}/synthesize", data=b"not json")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        try:
            urllib.request.urlopen(f"http://localhost:{port}/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
