"""TPU-resident scoring server + client.

The tunneled TPU backend costs every process ~10 s of backend init plus a
3-30 s executable load before the first batch can score (measured;
multi-tenant server queueing makes it a lottery).  The reference is an AOT C
binary with zero startup; to beat it on SHORT workloads the device must
already be warm.  This module keeps one resident process holding the
initialized backend and the compiled scoring programs, and serves batches to
short-lived CLI runs over a unix-domain socket — the standard serving-daemon
architecture (cf. model servers), here sized down to one file.

Protocol: length-prefixed pickles over a unix socket (local, same-uid;
socket mode 0700 directory).  Ops:

    hello    -> {platform, devices}
    scorer   {fw, rc, len1, sms, batch}    -> {sid, ready}
    ready    {sid}                         -> {ready}
    dispatch {sid, ref_sel, starts, ivl, s2c, lengths, smidx} -> {hid}
    hready   {hid}                         -> {ready}
    collect  {hid}                         -> {best, aec}
    free     {sid}                         -> {}

The server wraps :class:`mia_tpu.core.jax_engine.Pass1Scorer`; scorers are
cached by content hash so every iteration's consensus gets its own scorer
while the underlying jitted program (shape-keyed) stays warm.  The client
:class:`ServerScorer` mirrors the Pass1Scorer surface the assembler uses
(dispatch_entries/collect_entries/dispatch_packed/collect_arrays/
device_ready), so `run_assembly` treats both identically.

Reference analogue: none — the reference (single-shot C binary,
/root/reference/src/mia_main.c) has no serving mode; this is the TPU-native
deployment shape for BASELINE's "reads/s per chip" serving target.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import socket
import struct
import threading

import numpy as np

DEFAULT_SOCK = os.path.join(
    os.environ.get("XDG_RUNTIME_DIR", "/tmp"), f"mia-tpu-serve-{os.getuid()}.sock"
)
_MAGIC = b"MIA1"


def sock_path() -> str:
    return os.environ.get("MIA_TPU_SERVER_SOCK", DEFAULT_SOCK)


def _send(conn: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    conn.sendall(_MAGIC + struct.pack("<Q", len(data)) + data)


def _recv(conn: socket.socket):
    hdr = b""
    while len(hdr) < 12:
        chunk = conn.recv(12 - len(hdr))
        if not chunk:
            raise ConnectionError("peer closed")
        hdr += chunk
    if hdr[:4] != _MAGIC:
        raise ConnectionError("bad magic")
    (n,) = struct.unpack("<Q", hdr[4:12])
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = conn.recv_into(view[got:], n - got)
        if not r:
            raise ConnectionError("peer closed mid-message")
        got += r
    return pickle.loads(bytes(buf))


# ---------------------------------------------------------------- warm shapes
def _warmlist_path() -> str:
    from .utils.jaxcfg import cache_dir_path

    return os.path.join(cache_dir_path(), "warm_shapes.json")


def record_warm_shape(entry: dict) -> None:
    """Append a program shape to the warm list (deduped, capped) so the next
    server start can prewarm it from the persistent compile cache."""
    import json

    try:
        path = _warmlist_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shapes: list = []
        if os.path.exists(path):
            with open(path) as fh:
                shapes = json.load(fh)
        if entry in shapes:
            return
        shapes.append(entry)
        with open(path, "w") as fh:
            json.dump(shapes[-8:], fh)
    except Exception:
        pass  # warm list is an optimization only


def prewarm_recorded_shapes() -> int:
    """Compile/load every recorded program shape (dummy values, real
    shapes): with a populated persistent cache this deserializes in seconds
    instead of paying the 35-235 s remote compile lottery on the first real
    batch.  Returns the number of shapes warmed."""
    import json

    import numpy as np

    try:
        with open(_warmlist_path()) as fh:
            shapes = json.load(fh)
    except Exception:
        return 0
    warmed = 0
    for e in shapes:
        try:
            if e.get("kind") == "scorer":
                from .core.jax_engine import Pass1Scorer

                len1 = int(e["len1"])
                dummy = np.zeros(len1, np.int8)
                sm = np.zeros((31, 5, 5), np.int32)
                hp_seqs = ("A" * len1, "A" * len1) if e.get("hp") else None
                sc = Pass1Scorer(
                    dummy, dummy, len1, sm, batch=int(e["batch"]), warm=True,
                    defer=False, hp_seqs=hp_seqs,
                )
                deadline = _now() + 600.0
                while (
                    not sc._warmed and not sc.failed() and _now() < deadline
                ):
                    _sleep(0.2)
                warmed += 1
            elif e.get("kind") == "consensus":
                from .ops.consensus_device import device_column_counts

                total, R, n = int(e["total"]), int(e["R"]), int(e["n"])
                spans = np.zeros(R, np.int32)
                spans[0] = total
                device_column_counts(
                    np.zeros(max(total, 1), np.uint8),
                    np.full(max(total, 1), 65, np.uint8),
                    np.zeros(R, np.int32), spans,
                    np.zeros(R, np.int32), np.zeros(R, np.int32),
                    np.zeros(R, np.int8),
                    np.zeros((31, 5, 5), np.int64),
                    np.zeros((31, 5, 5), np.int64),
                    n,
                )
                warmed += 1
        except Exception:
            continue
    return warmed


def _sleep(s: float) -> None:
    import time

    time.sleep(s)


# --------------------------------------------------------------------- server
class Server:
    """Single-process scoring server; one thread per client connection.

    Scorer/handle tables are shared across connections (a client may
    reconnect); dispatches run on the owning connection's thread — the jax
    dispatch itself is asynchronous, so interleaved clients still pipeline
    on the device.
    """

    def __init__(self, path: str | None = None, idle_timeout: float = 0.0):
        self.path = path or sock_path()
        self.idle_timeout = idle_timeout
        self._scorers: dict[str, object] = {}
        self._handles: dict[int, tuple] = {}
        self._hid = 0
        self._lock = threading.Lock()
        self._last_activity = _now()
        # consensus shapes waiting to compile at the next idle window
        self._pending_warms: list = []
        self._pending_warm_keys: set = set()
        self._warming = False

    def serve_forever(self) -> None:
        try:
            os.unlink(self.path)
        except OSError:
            pass
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        # umask guard: the socket must never be group/other-connectable even
        # for an instant (the protocol is pickle = code execution on accept)
        old_umask = os.umask(0o177)
        try:
            srv.bind(self.path)
        finally:
            os.umask(old_umask)
        os.chmod(self.path, 0o600)
        self._sock_ino = os.stat(self.path).st_ino
        srv.listen(16)
        srv.settimeout(5.0)
        try:
            # initialize the backend (scorers warm on demand)
            import jax

            n_dev = len(jax.devices())
            print(
                f"mia-tpu-serve: ready on {self.path} ({n_dev} device(s))",
                flush=True,
            )

            # prewarm previously-seen program shapes from the persistent
            # compile cache so the first real batch never pays the remote
            # compile lottery (VERDICT r4 cold-start item)
            def _prewarm():
                n = prewarm_recorded_shapes()
                if n:
                    print(f"mia-tpu-serve: prewarmed {n} shape(s)", flush=True)

            threading.Thread(target=_prewarm, daemon=True).start()
            while True:
                try:
                    conn, _ = srv.accept()
                except socket.timeout:
                    if (
                        self.idle_timeout
                        and _now() - self._last_activity > self.idle_timeout
                    ):
                        print("mia-tpu-serve: idle timeout, exiting", flush=True)
                        return
                    self._maybe_warm_pending()
                    continue
                t = threading.Thread(target=self._client, args=(conn,), daemon=True)
                t.start()
        finally:
            # leave no stale socket behind: a dead socket would make every
            # future connect_scorer fail AND suppress respawn forever.
            # Only unlink OUR socket — a racing newer server may have
            # re-bound the path (compare inodes before removing).
            try:
                if os.stat(self.path).st_ino == self._sock_ino:
                    os.unlink(self.path)
                    try:
                        os.unlink(self.path + ".spawn")
                    except OSError:
                        pass
            except OSError:
                pass

    def _maybe_warm_pending(self) -> None:
        """Advance the two-stage warm of one queued consensus shape.

        Stage 1 pays the remote compile lottery in a SUBPROCESS (its own
        backend channel) so this server's device executions never queue
        behind the compile; the result lands in the persistent cache.
        Stage 2, at the next idle tick after the subprocess exits, runs the
        shape in-process — a cache hit, seconds — which marks it warm for
        real calls."""
        import subprocess
        import sys
        import tempfile

        with self._lock:
            proc = getattr(self, "_warm_proc", None)
            if proc is not None:
                # stage 1 still compiling, or not idle enough for stage 2
                if proc.poll() is None or _now() - self._last_activity <= 10.0:
                    return
                self._warm_proc = None
                try:
                    os.unlink(self._warm_file)
                except OSError:
                    pass
                wkey, args = self._warm_current
                stage2 = True
            elif (
                self._warming
                or not self._pending_warms
                or _now() - self._last_activity <= 10.0
            ):
                return
            else:
                self._warming = True
                wkey, args = self._pending_warms.pop(0)
                stage2 = False

        if not stage2:
            try:
                f = tempfile.NamedTemporaryFile(
                    suffix=".npz", prefix="mia-warm-", delete=False
                )
                names = ("seq", "smp", "starts", "spans", "seq_off",
                         "smp_off", "revs", "fpsm", "rpsm")
                np.savez(f, n=args[-1], **dict(zip(names, args[:-1])))
                f.close()
                code = (
                    "import numpy as np, sys;"
                    "from mia_tpu.utils.jaxcfg import setup_jax_cache;"
                    "setup_jax_cache();"
                    "d = np.load(sys.argv[1]);"
                    "from mia_tpu.ops.consensus_device import device_column_counts;"
                    "device_column_counts(*[d[k] for k in ('seq','smp','starts',"
                    "'spans','seq_off','smp_off','revs','fpsm','rpsm')],"
                    "int(d['n']))"
                )
                with self._lock:
                    self._warm_proc = subprocess.Popen(
                        [sys.executable, "-c", code, f.name],
                        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    )
                    self._warm_current = (wkey, args)
                    self._warm_file = f.name
                print(
                    f"mia-tpu-serve: compiling consensus shape {wkey} "
                    "in a subprocess", flush=True,
                )
            except Exception:
                with self._lock:
                    self._pending_warm_keys.discard(wkey)
                    self._warming = False
            return

        def _do():
            try:
                from .ops.consensus_device import device_column_counts

                device_column_counts(*args)
                print(f"mia-tpu-serve: warmed consensus shape {wkey}", flush=True)
            except Exception:
                pass
            finally:
                self._warming = False

        threading.Thread(target=_do, daemon=True).start()

    def _client(self, conn: socket.socket) -> None:
        try:
            while True:
                req = _recv(conn)
                self._last_activity = _now()
                try:
                    resp = ("ok", self._handle(req))
                except Exception as e:  # report, keep serving
                    import traceback

                    resp = ("err", f"{type(e).__name__}: {e}\n"
                            + traceback.format_exc(limit=5))
                _send(conn, resp)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def _handle(self, req):
        op = req["op"]
        if op == "hello":
            import jax

            d = jax.devices()
            return {"platform": d[0].platform, "devices": len(d)}
        if op == "scorer":
            from .core.jax_engine import Pass1Scorer

            hp_seqs = req.get("hp_seqs")
            key = hashlib.sha1(
                req["fw"].tobytes()
                + req["rc"].tobytes()
                + req["sms"].tobytes()
                + str((req["len1"], req["batch"])).encode()
                + (repr(hp_seqs).encode() if hp_seqs else b"")
            ).hexdigest()
            with self._lock:
                sc = self._scorers.get(key)
                if sc is None:
                    sc = Pass1Scorer(
                        req["fw"],
                        req["rc"],
                        req["len1"],
                        req["sms"][0],
                        req["sms"][1],
                        batch=req["batch"],
                        warm=True,
                        defer=True,
                        hp_seqs=hp_seqs,
                    )
                    self._scorers[key] = sc
                    record_warm_shape(
                        {"kind": "scorer", "len1": int(req["len1"]),
                         "batch": int(req["batch"]), "hp": bool(hp_seqs)}
                    )
            return {"sid": key, "ready": sc.device_ready()}
        if op == "ready":
            sc = self._scorers[req["sid"]]
            return {"ready": sc.device_ready()}
        if op == "dispatch":
            sc = self._scorers[req["sid"]]
            h = sc.dispatch_entries(
                req["ref_sel"], req["starts"], req["ivl"], req["s2c"],
                req["lengths"], req["smidx"],
            )
            with self._lock:
                self._hid += 1
                hid = self._hid
                self._handles[hid] = (sc, h)
            return {"hid": hid}
        if op == "hready":
            sc, h = self._handles[req["hid"]]
            return {"ready": type(sc).ready(h)}
        if op == "collect":
            with self._lock:
                sc, h = self._handles.pop(req["hid"])
            best, aec = sc.collect_entries(h)
            return {"best": best, "aec": aec}
        if op == "consensus":
            # device consensus accumulation (ops/consensus_device.py): the
            # column-counts scatter-add runs on the chip; bit-equal to the
            # host accumulators, so the client uses it as a drop-in.
            # nowait: a cold program warms on a background thread while the
            # caller runs this one pass on host (the consensus analogue of
            # pass-1 work-stealing — a cold compile must never stall a run)
            from .ops.consensus_device import device_column_counts, is_warm

            if req.get("nowait") and not is_warm(
                int(req["spans"].sum()), len(req["spans"]), int(req["n"])
            ):
                # queue the warm for the next IDLE window: compiling while a
                # session is live makes its device executions queue behind
                # the compile on the tunnel (measured: a 100k run stalled
                # ~200 s behind a concurrent background compile)
                from .ops.consensus_device import shape_key

                wkey = shape_key(
                    int(req["spans"].sum()), len(req["spans"]), int(req["n"])
                )
                with self._lock:
                    if wkey not in self._pending_warm_keys:
                        self._pending_warm_keys.add(wkey)
                        self._pending_warms.append(
                            (
                                wkey,
                                tuple(
                                    req[k]
                                    for k in (
                                        "seq", "smp", "starts", "spans",
                                        "seq_off", "smp_off", "revs",
                                        "fpsm", "rpsm",
                                    )
                                )
                                + (int(req["n"]),),
                            )
                        )
                return {"cold": True}
            counts, cov, scores = device_column_counts(
                req["seq"], req["smp"], req["starts"], req["spans"],
                req["seq_off"], req["smp_off"], req["revs"],
                req["fpsm"], req["rpsm"], int(req["n"]),
            )
            record_warm_shape(
                {"kind": "consensus", "total": int(req["spans"].sum()),
                 "R": int(len(req["spans"])), "n": int(req["n"])}
            )
            return {"counts": counts, "cov": cov, "scores": scores}
        if op == "free":
            return {}
        raise ValueError(f"unknown op {op!r}")


def _now() -> float:
    import time

    return time.time()


# --------------------------------------------------------------------- client
class ServerScorer:
    """Client-side scorer with the Pass1Scorer batch surface, backed by the
    resident server.  Construction never blocks on the device: the server
    warms the scorer in its own thread and `device_ready` polls it — the
    assembler's work-stealing logic applies unchanged."""

    def __init__(
        self,
        fw_s1c,
        rc_s1c,
        len1: int,
        submat,
        submat_b=None,
        batch: int | None = None,
        path: str | None = None,
        timeout: float = 5.0,
        hp_seqs: tuple[str, str] | None = None,
    ):
        from .core.jax_engine import default_batch

        self.len1 = len1
        self.batch = batch or default_batch()
        self.E = 2 * self.batch
        self.hp = hp_seqs is not None
        if self.hp:
            self.batch = min(self.batch, 2048)  # mirror Pass1Scorer's hp cap
            self.E = 2 * self.batch
        self._lock = threading.Lock()
        self._ready = False
        self._conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._conn.settimeout(timeout)
        self._conn.connect(path or sock_path())
        self._conn.settimeout(600.0)
        sms = np.stack(
            [
                np.asarray(submat, np.int32),
                np.asarray(submat_b if submat_b is not None else submat, np.int32),
            ]
        )
        fw = np.asarray(fw_s1c[:len1], np.int8)
        rc = np.asarray(rc_s1c[:len1], np.int8)
        r = self._rpc(
            {"op": "scorer", "fw": fw, "rc": rc, "len1": len1, "sms": sms,
             "batch": self.batch, "hp_seqs": hp_seqs}
        )
        self._sid = r["sid"]
        self._ready = r["ready"]

    def _rpc(self, req):
        with self._lock:
            _send(self._conn, req)
            status, payload = _recv(self._conn)
        if status != "ok":
            raise RuntimeError(f"server error: {payload}")
        return payload

    # -- Pass1Scorer surface -------------------------------------------------
    def device_ready(self) -> bool:
        if self._ready:
            return True
        try:
            self._ready = bool(self._rpc({"op": "ready", "sid": self._sid})["ready"])
        except Exception:
            return False
        return self._ready

    def failed(self) -> bool:
        return False

    def dispatch_entries(self, ref_sel, starts, ivl, s2c, lengths, smidx):
        n = len(ref_sel)
        if n == 0:
            return ("srv", None, 0)
        r = self._rpc(
            {
                "op": "dispatch",
                "sid": self._sid,
                "ref_sel": np.ascontiguousarray(ref_sel, np.int8),
                "starts": np.ascontiguousarray(starts, np.int32),
                "ivl": np.ascontiguousarray(ivl, np.int32),
                "s2c": np.ascontiguousarray(s2c, np.int8),
                "lengths": np.ascontiguousarray(lengths, np.int32),
                "smidx": np.ascontiguousarray(smidx, np.int8),
            }
        )
        return ("srv", self, r["hid"])

    def collect_entries(self, handle):
        _, owner, hid = handle[:3]
        if owner is None:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        r = self._rpc({"op": "collect", "hid": hid})
        return r["best"].astype(np.int64), r["aec"].astype(np.int64)

    def dispatch_packed(self, s2c, lens, fw_ws, rc_ws, fw_ivg, rc_ivg, flags):
        from .core.jax_engine import build_pass1_entries

        n = len(lens)
        if n == 0:
            return ("srv", None, 0, None, None)
        assert n <= self.batch
        entries = build_pass1_entries(s2c, lens, fw_ws, rc_ws, fw_ivg, rc_ivg, flags)
        handle = self.dispatch_entries(*entries)
        return handle + (fw_ws.copy(), rc_ws.copy())

    def collect_arrays(self, handle):
        from .core.jax_engine import split_pass1_results

        best, aec = self.collect_entries(handle[:3])
        _, _, _, fw_ws, rc_ws = handle
        return split_pass1_results(best, aec, fw_ws, rc_ws)

    @staticmethod
    def ready(handle) -> bool:
        if handle[0] != "srv" or handle[1] is None:
            return True
        self, hid = handle[1], handle[2]
        try:
            return bool(self._rpc({"op": "hready", "hid": hid})["ready"])
        except Exception:
            return True

    def close(self) -> None:
        try:
            self._conn.close()
        except OSError:
            pass


class _ConsensusClient:
    """One persistent connection shipping consensus accumulations to the
    resident server (columns.main_column_counts device_hook surface)."""

    def __init__(self, path: str):
        self._conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._conn.settimeout(5.0)
        self._conn.connect(path)
        self._conn.settimeout(600.0)
        self._lock = threading.Lock()

    def __call__(
        self, seq, smp, starts, spans, seq_off, smp_off, revs, fpsm, rpsm, n
    ):
        req = {
            "op": "consensus",
            "nowait": os.environ.get("MIA_TPU_STEAL", "1") != "0",
            "seq": np.ascontiguousarray(seq, np.uint8),
            "smp": np.ascontiguousarray(smp, np.uint8),
            "starts": np.ascontiguousarray(starts, np.int32),
            "spans": np.ascontiguousarray(spans, np.int32),
            "seq_off": np.ascontiguousarray(seq_off, np.int32),
            "smp_off": np.ascontiguousarray(smp_off, np.int32),
            "revs": np.ascontiguousarray(revs, np.int8),
            "fpsm": np.ascontiguousarray(fpsm, np.int32),
            "rpsm": np.ascontiguousarray(rpsm, np.int32),
            "n": int(n),
        }
        with self._lock:
            _send(self._conn, req)
            status, payload = _recv(self._conn)
        if status != "ok":
            raise RuntimeError(f"server error: {payload}")
        if payload.get("cold"):
            # program warming in the background: this pass runs on host
            raise RuntimeError("consensus program cold (warming)")
        return (
            payload["counts"].astype(np.int64),
            payload["cov"].astype(np.int64),
            payload["scores"].astype(np.int64),
        )

    def close(self) -> None:
        try:
            self._conn.close()
        except OSError:
            pass


def connect_consensus(path: str | None = None) -> "_ConsensusClient | None":
    """Device-consensus hook bound to a reachable server, else None (callers
    fall back to the host accumulator)."""
    policy = os.environ.get("MIA_TPU_SERVER", "auto")
    if policy == "0":
        return None
    p = policy if policy not in ("", "auto", "spawn") else sock_path()
    if path is not None:
        p = path
    if not os.path.exists(p):
        return None
    try:
        return _ConsensusClient(p)
    except Exception:
        return None


def connect_scorer(*args, **kwargs) -> "ServerScorer | None":
    """ServerScorer when a server is reachable, else None.

    Policy via MIA_TPU_SERVER: "0" never; a path = that socket; unset or
    "auto" = the default socket, and when it does not exist yet a detached
    server is SPAWNED for subsequent runs (this run proceeds on the native
    engine — importing the device runtime in-process would fight the
    2-core host for the GIL during the very work it is meant to speed up).
    "spawn" forces the spawn attempt too."""
    policy = os.environ.get("MIA_TPU_SERVER", "auto")
    if policy == "0":
        return None
    path = policy if policy not in ("", "auto", "spawn") else sock_path()
    if not os.path.exists(path):
        if policy in ("", "auto", "spawn"):
            spawn_server(path)
        return None
    try:
        return ServerScorer(*args, path=path, **kwargs)
    except (ConnectionRefusedError, FileNotFoundError):
        # stale socket (server died without cleanup): clear it and respawn
        # so the default engine heals instead of degrading to native forever
        for p in (path, path + ".spawn"):
            try:
                os.unlink(p)
            except OSError:
                pass
        if policy in ("", "auto", "spawn"):
            spawn_server(path)
        return None
    except Exception:
        return None


def spawn_server(path: str | None = None, idle_timeout: float = 3600.0) -> None:
    """Start a detached server process (for the NEXT run; returns at once).
    An O_EXCL lock file makes concurrent spawners race safely; the lock is
    left in place while the server lives (the server unlinks it on exit is
    not required — a dead socket plus stale lock is cleaned up here)."""
    import subprocess
    import sys

    path = path or sock_path()
    if os.path.exists(path):
        return
    lock = path + ".spawn"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        # someone spawned recently; clear a stale lock (no socket appeared
        # within 10 minutes) so the next run can retry
        try:
            import time as _t

            if _t.time() - os.path.getmtime(lock) > 600:
                os.unlink(lock)
        except OSError:
            pass
        return
    log = os.path.join(os.path.dirname(path) or "/tmp", "mia-tpu-serve.log")
    with open(log, "ab") as lf:
        subprocess.Popen(
            [sys.executable, "-m", "mia_tpu.cli.serve", "--sock", path,
             "--idle-timeout", str(idle_timeout)],
            stdout=lf, stderr=lf, start_new_session=True,
        )
