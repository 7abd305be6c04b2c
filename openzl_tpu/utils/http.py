"""HTTP helpers for ceremony coordination
(reference openzl-util/src/http/{reqwest,tide}.rs:12-54 — used by downstream
trusted-setup ceremony servers).

Stdlib-only (zero-egress image): `KnownUrlClient` mirrors the reqwest
wrapper's known-URL POST/GET JSON API; `register_post` mirrors the tide
helper shape for registering POST handlers on a local coordinator.
"""

from __future__ import annotations

import json
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Any, Callable, Dict, Optional


class KnownUrlClient:
    """JSON-over-HTTP client bound to a base URL (reqwest.rs KnownUrlClient)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def post(self, path: str, payload: Any) -> Any:
        req = urllib.request.Request(
            f"{self.base_url}/{path.lstrip('/')}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode() or "null")

    def get(self, path: str) -> Any:
        with urllib.request.urlopen(
            f"{self.base_url}/{path.lstrip('/')}", timeout=self.timeout
        ) as resp:
            return json.loads(resp.read().decode() or "null")


def register_post(
    routes: Dict[str, Callable[[Any], Any]], path: str, handler: Callable[[Any], Any]
) -> None:
    """Register a POST JSON handler (tide.rs register_post shape)."""
    routes["/" + path.lstrip("/")] = handler


def serve(routes: Dict[str, Callable[[Any], Any]], port: int = 8080) -> HTTPServer:
    """Blocking JSON POST server over the registered routes."""

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib naming)
            fn = routes.get(self.path)
            if fn is None:
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"null")
            try:
                result = fn(payload)
                body = json.dumps(result).encode()
                self.send_response(200)
            except Exception as exc:  # surface handler errors as 500s
                body = json.dumps({"error": str(exc)}).encode()
                self.send_response(500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    return server
