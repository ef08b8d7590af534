"""Update polling over a real local HTTP endpoint
(models reference tests/test_core_updates.py)."""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from yamimageprocessor_tpu.core.app_core import AppConfiguration, AppCore
from yamimageprocessor_tpu.core.updates import fetch_update_metadata


@pytest.fixture()
def update_server():
    payload = {
        "version": "2.5.0",
        "url": "https://example.invalid/yam-2.5.0",
        "changelog": "faster watershed",
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}/updates.json"
    server.shutdown()


def test_fetch_update_metadata(update_server):
    metadata = fetch_update_metadata(update_server)
    assert metadata is not None
    assert metadata.version == "2.5.0"
    assert "watershed" in metadata.changelog


def test_fetch_failure_returns_none():
    assert fetch_update_metadata("http://127.0.0.1:9/none", timeout=0.5) is None


def test_app_core_update_cycle(tmp_path, update_server):
    cfg = AppConfiguration(
        allowed_roots=(tmp_path,),
        session_root=tmp_path / "s",
        update_endpoint=update_server,
    )
    core = AppCore(cfg)
    core.bootstrap()
    try:
        seen = []
        core.update_dispatcher.add_listener(seen.append)
        metadata = core.check_for_updates()
        assert metadata is not None and metadata.version == "2.5.0"
        assert seen and core.thread_controller.paused
        core.acknowledge_update()
        assert not core.thread_controller.paused
    finally:
        core.shutdown()


def test_async_update_check(tmp_path, update_server):
    cfg = AppConfiguration(
        allowed_roots=(tmp_path,),
        session_root=tmp_path / "s2",
        update_endpoint=update_server,
    )
    core = AppCore(cfg)
    core.bootstrap()
    try:
        task = core.check_for_updates(asynchronous=True)
        task.future.result(timeout=10)
        assert core.update_dispatcher.pending is not None
        core.acknowledge_update()
    finally:
        core.shutdown()


def test_format_update_notice():
    """Headless update notice (yam_processor/ui/update_dialog.py UpdateDialog)."""
    from yamimageprocessor_tpu.core.updates import (
        UpdateAction,
        UpdateMetadata,
        format_update_notice,
    )

    meta = UpdateMetadata(
        version="2.1.0",
        url="https://example.invalid/pkg",
        changelog="- faster watershed\n- CLAHE fixes",
        mandatory=True,
    )
    text = format_update_notice(meta)
    assert text.splitlines()[0] == "Update 2.1.0 available"
    assert "mandatory" in text
    assert "- faster watershed" in text
    assert text.rstrip().endswith("https://example.invalid/pkg")
    # minimal metadata renders just the title
    assert format_update_notice(UpdateMetadata(version="3.0")) == (
        "Update 3.0 available"
    )
    assert UpdateAction.ACKNOWLEDGE.value == "acknowledge"
    assert UpdateAction.INSTALL.value == "install"
