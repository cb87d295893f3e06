"""In-process Redis stand-in speaking the real RESP2 wire protocol.

The container has no Redis server and no fakeredis package, so the O17/O19
transport tests (reference: OffsetRangeRedisTest.kt,
RedisRemoteLockManagerTest.kt) run against this instead of a hand-rolled
dict stub.  What it enforces that a stub cannot:

- everything crosses a real socket as BYTES (so str/bytes handling in the
  backends is exercised exactly as with redis-py, which returns bytes);
- commands are parsed server-side from RESP arrays with real Redis
  semantics: SET [NX|XX] [EX|PX|KEEPTTL] (plain SET clears any TTL —
  the real-Redis behavior a naive stub misses), GET, DEL, EXISTS, PTTL;
- command execution is serialized under one lock, like Redis's
  single-threaded command loop, so NX races resolve atomically.

Public Redis protocol/command semantics only (redis.io documentation).
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time


class _Store:
    def __init__(self):
        self.data: dict[bytes, bytes] = {}
        self.expiry: dict[bytes, float] = {}
        self.lock = threading.Lock()

    def _evict(self, key: bytes) -> None:
        exp = self.expiry.get(key)
        if exp is not None and exp <= time.monotonic():
            self.data.pop(key, None)
            self.expiry.pop(key, None)

    # Each handler runs with self.lock held.
    def cmd_set(self, args: list[bytes]):
        key, value, rest = args[0], args[1], [a.upper() for a in args[2:]]
        nx = xx = keepttl = False
        ttl_ms = None
        i = 0
        while i < len(rest):
            opt = rest[i]
            if opt == b"NX":
                nx = True
            elif opt == b"XX":
                xx = True
            elif opt == b"KEEPTTL":
                keepttl = True
            elif opt in (b"EX", b"PX"):
                i += 1
                ttl_ms = int(rest[i]) * (1000 if opt == b"EX" else 1)
            else:
                return b"-ERR syntax error\r\n"
            i += 1
        self._evict(key)
        exists = key in self.data
        if (nx and exists) or (xx and not exists):
            return b"$-1\r\n"
        self.data[key] = value
        if ttl_ms is not None:
            self.expiry[key] = time.monotonic() + ttl_ms / 1000.0
        elif not keepttl:
            # Real Redis: a plain SET discards the existing TTL.
            self.expiry.pop(key, None)
        return b"+OK\r\n"

    def cmd_get(self, args: list[bytes]):
        key = args[0]
        self._evict(key)
        val = self.data.get(key)
        if val is None:
            return b"$-1\r\n"
        return b"$%d\r\n%s\r\n" % (len(val), val)

    def cmd_del(self, args: list[bytes]):
        n = 0
        for key in args:
            self._evict(key)
            if key in self.data:
                del self.data[key]
                self.expiry.pop(key, None)
                n += 1
        return b":%d\r\n" % n

    def cmd_exists(self, args: list[bytes]):
        n = 0
        for key in args:
            self._evict(key)
            n += int(key in self.data)
        return b":%d\r\n" % n

    def cmd_pttl(self, args: list[bytes]):
        key = args[0]
        self._evict(key)
        if key not in self.data:
            return b":-2\r\n"
        exp = self.expiry.get(key)
        if exp is None:
            return b":-1\r\n"
        return b":%d\r\n" % max(0, int((exp - time.monotonic()) * 1000))

    def cmd_ping(self, args: list[bytes]):
        return b"+PONG\r\n"

    def cmd_flushall(self, args: list[bytes]):
        self.data.clear()
        self.expiry.clear()
        return b"+OK\r\n"


def _read_exact(rfile, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = rfile.read(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


def _read_command(rfile) -> list[bytes] | None:
    line = rfile.readline()
    if not line:
        return None
    if not line.startswith(b"*"):
        raise ConnectionError(f"expected RESP array, got {line!r}")
    n = int(line[1:].strip())
    args = []
    for _ in range(n):
        hdr = rfile.readline()
        if not hdr.startswith(b"$"):
            raise ConnectionError(f"expected bulk string, got {hdr!r}")
        ln = int(hdr[1:].strip())
        args.append(_read_exact(rfile, ln))
        _read_exact(rfile, 2)  # trailing \r\n
    return args


class MiniRedisServer:
    """`with MiniRedisServer() as port:` — RESP2 server on 127.0.0.1."""

    def __init__(self):
        self.store = _Store()
        store = self.store

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                try:
                    while True:
                        args = _read_command(self.rfile)
                        if args is None:
                            return
                        name = "cmd_" + args[0].decode().lower()
                        fn = getattr(store, name, None)
                        with store.lock:
                            if fn is None:
                                reply = (
                                    b"-ERR unknown command '"
                                    + args[0]
                                    + b"'\r\n"
                                )
                            else:
                                reply = fn(args[1:])
                        self.wfile.write(reply)
                        self.wfile.flush()
                except (ConnectionError, OSError):
                    return

        self._srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    def __enter__(self) -> "MiniRedisServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()


class MiniRedisClient:
    """The redis-py surface subset the backends use (`set`/`get`/`delete`),
    over a real socket: arguments encoded to bytes, replies decoded from
    RESP — `get` returns BYTES, exactly like `redis.Redis` without
    `decode_responses`."""

    def __init__(self, port: int, host: str = "127.0.0.1"):
        self._sock = socket.create_connection((host, port))
        self._rfile = self._sock.makefile("rb")
        self._lock = threading.Lock()

    def close(self) -> None:
        self._rfile.close()
        self._sock.close()

    def _exec(self, *args):
        parts = [
            a if isinstance(a, (bytes, bytearray)) else str(a).encode()
            for a in args
        ]
        payload = b"*%d\r\n" % len(parts) + b"".join(
            b"$%d\r\n%s\r\n" % (len(p), p) for p in parts
        )
        with self._lock:
            self._sock.sendall(payload)
            return self._read_reply()

    def _read_reply(self):
        line = self._rfile.readline()
        kind, rest = line[:1], line[1:].strip()
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            raise RuntimeError(rest.decode())
        if kind == b":":
            return int(rest)
        if kind == b"$":
            ln = int(rest)
            if ln == -1:
                return None
            data = _read_exact(self._rfile, ln)
            _read_exact(self._rfile, 2)
            return data
        raise ConnectionError(f"bad reply {line!r}")

    # redis-py surface ----------------------------------------------------
    def set(self, key, value, nx=False, xx=False, px=None, ex=None):
        args = ["SET", key, value]
        if nx:
            args.append("NX")
        if xx:
            args.append("XX")
        if ex is not None:
            args += ["EX", ex]
        if px is not None:
            args += ["PX", px]
        reply = self._exec(*args)
        return True if reply == "OK" else None

    def get(self, key):
        return self._exec("GET", key)

    def delete(self, *keys):
        return self._exec("DEL", *keys)

    def exists(self, *keys):
        return self._exec("EXISTS", *keys)

    def pttl(self, key):
        return self._exec("PTTL", key)

    def ping(self):
        return self._exec("PING")

    def flushall(self):
        return self._exec("FLUSHALL")
