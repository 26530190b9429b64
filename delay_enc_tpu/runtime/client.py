"""Client side of the warm prover daemon protocol (see daemon.py).

Pure host code — no jax import, no device touch — so a bench/driver process
can discover and use a warm daemon without paying any relay traffic itself.

Protocol: newline-delimited JSON over a unix socket.  One request line in;
for streaming commands ("prove", "batch") the daemon writes event lines
until a terminal {"event": "done"|"error"} line; "ping" gets a single
status line.
"""

from __future__ import annotations

import json
import os
import socket


def default_socket_path() -> str:
    env = os.environ.get("DELAY_ENC_DAEMON", "")
    if env in ("0", "off", "no"):
        return ""
    if env:
        return env
    # repo root = two levels above this package
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, ".daemon.sock")


def daemon_request(req: dict, on_event=None, timeout: float = 10.0,
                   socket_path: str | None = None):
    """Send one request; stream event lines to `on_event`; return the
    terminal dict ({"event": "done"/"error"} or the ping status), or None
    if the daemon is absent/unreachable.  `timeout` bounds each read (a
    proving repeat can take tens of seconds — pass a generous value for
    streaming commands)."""
    path = socket_path if socket_path is not None else default_socket_path()
    if not path or not os.path.exists(path):
        return None
    try:
        sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        sock.settimeout(min(timeout, 10.0))
        sock.connect(path)
        sock.settimeout(timeout)
        sock.sendall((json.dumps(req) + "\n").encode())
        f = sock.makefile("r")
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = d.get("event")
            if ev in ("done", "error") or "ok" in d:
                sock.close()
                return d
            if on_event:
                on_event(d)
        sock.close()
    except OSError:
        return None
    return None
