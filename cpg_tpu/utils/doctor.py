"""Environment diagnostics: `python -m cpg_tpu doctor`.

Production deployments of this stack have two recurring failure modes that
are miserable to diagnose from a hung training job (both observed on the
round-3 hardware): a wedged TPU relay, where ANY `jax.devices()` call in an
axon-enabled interpreter blocks forever, and a wrong interpreter, where the
invoking python simply has no jax. `doctor` probes everything a run needs
*with timeouts*, reports one line per check, and exits nonzero if the
environment cannot run the requested backend.

The reference has no analogue (a single-GPU torch repo assumes a working
local CUDA); this is part of the TPU build's ops layer, like the relay
probes in bench.py/__graft_entry__.py.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _check_imports():
    out = {}
    for mod in ("jax", "flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            m = __import__(mod)
            out[mod] = getattr(m, "__version__", "ok")
        except ImportError as e:
            out[mod] = f"MISSING ({e})"
    return out


def _probe_devices(timeout_s: float):
    """Enumerate devices in a SUBPROCESS with a timeout — a dead axon relay
    hangs jax.devices() forever in-process, so the probe must be killable."""
    code = ("import jax, json; "
            "print(json.dumps({'backend': jax.default_backend(), "
            "'devices': [str(d) for d in jax.devices()]}))")
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           timeout=timeout_s, text=True)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            return {"ok": False, "seconds": round(dt, 1),
                    "error": (r.stderr or "").strip()[-400:]}
        info = json.loads(r.stdout.strip().splitlines()[-1])
        info.update(ok=True, seconds=round(dt, 1))
        return info
    except subprocess.TimeoutExpired:
        return {"ok": False, "seconds": round(timeout_s, 1),
                "error": f"device enumeration hung for {timeout_s:.0f}s — "
                         "if the platform list includes a remote plugin "
                         "(axon), the relay is likely wedged; CPU-only runs "
                         "(JAX_PLATFORMS=cpu) are unaffected"}


def _check_compile_cache():
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not d:
        return {"configured": False,
                "hint": "set JAX_COMPILATION_CACHE_DIR — remote TPU "
                        "compiles can cost minutes each"}
    entries = 0
    size = 0
    if os.path.isdir(d):
        for root, _, files in os.walk(d):
            for f in files:
                entries += 1
                try:
                    size += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return {"configured": True, "dir": d, "exists": os.path.isdir(d),
            "entries": entries, "size_mb": round(size / 1e6, 1)}


def run_doctor(timeout_s: float = 90.0, as_json: bool = False,
               _print=print) -> int:
    report = {
        "python": sys.executable,
        "pythonpath": os.environ.get("PYTHONPATH", ""),
        "jax_platforms_env": os.environ.get("JAX_PLATFORMS", ""),
        "imports": _check_imports(),
        "compile_cache": _check_compile_cache(),
        "data_dir": {
            "env": os.environ.get("CPG_DATA_DIR", ""),
            "present": os.path.isdir(os.environ.get("CPG_DATA_DIR", "")
                                     or "/nonexistent"),
            "note": "synthetic generators are used when unset",
        },
        "host": {"cpus": os.cpu_count(),
                 "disk_free_gb": round(
                     shutil.disk_usage(os.getcwd()).free / 1e9, 1)},
    }
    missing = [k for k, v in report["imports"].items()
               if isinstance(v, str) and v.startswith("MISSING")]
    if missing:
        report["verdict"] = (f"UNHEALTHY: missing {', '.join(missing)} — "
                             "wrong interpreter? (jax lives in a venv on "
                             "some images; see bench.py's re-exec shim)")
        ok = False
    else:
        report["backend"] = _probe_devices(timeout_s)
        ok = report["backend"]["ok"]
        report["verdict"] = ("OK" if ok
                             else "UNHEALTHY: backend unreachable "
                                  "(see backend.error)")
    if as_json:
        _print(json.dumps(report))
    else:
        for key in ("python", "pythonpath", "jax_platforms_env"):
            _print(f"{key:18} {report[key] or '(unset)'}")
        for mod, v in report["imports"].items():
            _print(f"{'import ' + mod:18} {v}")
        cc = report["compile_cache"]
        _print(f"{'compile cache':18} "
               + (f"{cc['dir']} ({cc['entries']} entries, "
                  f"{cc['size_mb']} MB)" if cc.get("configured")
                  else f"NOT CONFIGURED — {cc['hint']}"))
        dd = report["data_dir"]
        _print(f"{'CPG_DATA_DIR':18} "
               + (dd["env"] if dd["present"]
                  else f"{dd['env'] or '(unset)'} — {dd['note']}"))
        if "backend" in report:
            b = report["backend"]
            _print(f"{'backend':18} "
                   + (f"{b['backend']} {b['devices']} "
                      f"({b['seconds']}s probe)" if b["ok"]
                      else f"FAILED after {b['seconds']}s: {b['error']}"))
        _print(f"{'verdict':18} {report['verdict']}")
    return 0 if ok else 1
