"""Model-zoo downloader: cache, checksum verification, name resolution.

Zero-egress environment: the full download logic runs against a localhost
HTTP server. Reference behavior being matched:
`/root/reference/alpha_clip_rw/alpha_clip.py:43-75` (cached + SHA-verified
download) and `:135-141` (name -> URL resolution with the available-models
error).
"""

import hashlib
import http.server
import threading

import pytest

from camouflaged_vlm_tpu.io.download import (
    available_models,
    download,
    resolve_checkpoint,
)

PAYLOAD = b"not a real checkpoint, but 32 bytes!!"
SHA = hashlib.sha256(PAYLOAD).hexdigest()


@pytest.fixture(scope="module")
def server():
    hits = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if self.path.endswith("missing.pt"):
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(PAYLOAD)))
            self.end_headers()
            self.wfile.write(PAYLOAD)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", hits
    srv.shutdown()


def test_download_verifies_and_caches(server, tmp_path):
    base, hits = server
    url = f"{base}/models/{SHA}/ckpt.pt"  # OpenAI layout: sha in the path
    before = len(hits)
    p = download(url, root=str(tmp_path))
    assert open(p, "rb").read() == PAYLOAD
    # second call is a cache hit: no new request
    assert download(url, root=str(tmp_path)) == p
    assert len(hits) == before + 1


def test_download_rejects_bad_checksum(server, tmp_path):
    base, _ = server
    url = f"{base}/models/{'0' * 64}/bad.pt"
    with pytest.raises(RuntimeError, match="SHA256"):
        download(url, root=str(tmp_path))
    # the failed download must not poison the cache
    assert not (tmp_path / "bad.pt").exists()


def test_corrupted_cache_entry_is_redownloaded(server, tmp_path):
    base, _ = server
    url = f"{base}/models/{SHA}/ckpt.pt"
    download(url, root=str(tmp_path))
    (tmp_path / "ckpt.pt").write_bytes(b"corrupted")
    p = download(url, root=str(tmp_path))
    assert open(p, "rb").read() == PAYLOAD


def test_download_refuses_directory_target(server, tmp_path):
    base, _ = server
    (tmp_path / "dir.pt").mkdir()
    with pytest.raises(RuntimeError, match="not a regular file"):
        download(f"{base}/models/{SHA}/dir.pt", root=str(tmp_path))


def test_unverified_urls_do_not_collide(server, tmp_path):
    """URLs without an embedded SHA are unverifiable, so the cache must key
    them by URL — a same-named file from another host is a different entry."""
    base, hits = server
    p1 = download(f"{base}/hostA/model.pt", root=str(tmp_path))
    p2 = download(f"{base}/hostB/model.pt", root=str(tmp_path))
    assert p1 != p2
    before = len(hits)
    assert download(f"{base}/hostA/model.pt", root=str(tmp_path)) == p1
    assert len(hits) == before  # still a cache hit for the same URL


def test_resolve_checkpoint(server, tmp_path):
    base, _ = server
    # existing path passes through
    f = tmp_path / "local.pth"
    f.write_bytes(b"x")
    assert resolve_checkpoint(str(f)) == str(f)
    # registry name downloads via its URL
    reg = {"Tiny/Test": f"{base}/models/{SHA}/ckpt.pt"}
    p = resolve_checkpoint("Tiny/Test", root=str(tmp_path), registry=reg)
    assert open(p, "rb").read() == PAYLOAD
    # raw URL works too
    assert resolve_checkpoint(
        f"{base}/models/{SHA}/ckpt.pt", root=str(tmp_path), registry=reg
    ) == p
    # missing file with a checkpoint extension: file error, not a download
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("/nonexistent/model.pth", registry=reg)
    # unknown model name: the reference's available-models error
    with pytest.raises(RuntimeError, match="available models"):
        resolve_checkpoint("ViT-Z/99", registry=reg)
    assert "ViT-L/14@336px" in available_models()


def test_none_passthrough():
    assert resolve_checkpoint(None) is None
    assert resolve_checkpoint("") == ""
