"""Web app (examples/webapp.py): the interactive L7 layer must serve the
UI, generate audio, stream chunks, and transcribe uploads end-to-end with
the tiny engines (the reference's TTS App / STT App equivalents)."""

import io
import json
import struct
import threading
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh


@pytest.fixture(scope="module")
def server():
    import sys

    sys.path.insert(0, ".")
    from examples import webapp

    httpd = webapp.serve(port=0, tiny=True, poll=True)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _get(url: str, timeout=600):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_index_and_engine_list(server):
    code, ctype, body = _get(server + "/")
    assert code == 200 and "text/html" in ctype
    assert b"tpu-audio" in body
    code, _, body = _get(server + "/api/engines")
    d = json.loads(body)
    assert d["tts"] == ["marvis"] and d["stt"] == ["funasr"]


def test_tts_wav(server):
    code, ctype, body = _get(
        server + "/api/tts?engine=marvis&text=Hello%20there")
    assert code == 200 and ctype == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    n = struct.unpack("<I", body[40:44])[0]
    assert n > 0 and len(body) == 44 + n


def test_tts_stream_sse(server):
    code, ctype, body = _get(
        server + "/api/tts_stream?engine=marvis&text=Hi")
    assert code == 200 and "text/event-stream" in ctype
    events = [ln[len("data: "):] for ln in body.decode().splitlines()
              if ln.startswith("data: ")]
    assert json.loads(events[-1]) == {"done": True}
    chunks = [json.loads(e) for e in events[:-1]]
    assert chunks, "no audio chunks streamed"
    import base64

    pcm = np.frombuffer(base64.b64decode(chunks[0]["pcm"]), np.float32)
    assert np.isfinite(pcm).all() and len(pcm) > 0


def test_stt_upload(server):
    from examples.webapp import wav_bytes

    audio = (0.1 * np.sin(np.arange(16000) / 10)).astype(np.float32)
    req = urllib.request.Request(server + "/api/stt?engine=funasr",
                                 data=wav_bytes(audio, 16000),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        d = json.loads(r.read())
    assert "text" in d and "seconds" in d


def test_stt_rejects_garbage(server):
    req = urllib.request.Request(server + "/api/stt?engine=funasr",
                                 data=b"not a wav", method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
