"""Opportunistic clean-window hunter + auto-banker (r10/r11 protocol,
r12 instance; round label via ROUND env, default r13).

Probes parallel capacity (tools/window_probe.py) every ~5 minutes and
appends one JSON line per probe to docs/window_hunt_r12.jsonl. The first
probe at or above GATE (default 5x; clean host reads 18-22x) triggers the
banking runs for the three parked absolute marks:

  - 768d IVF build  (ROWS=1M DIM=768 profile_build)      bar: >=40k rows/s
  - graph 1M build  (profile_graph_serving 1000000)      bar: >=17k rows/s
  - SemDeDup f32    (PRECISE=0 profile_semdedup)         vs banked 280.6s

and writes their stdout + before/after probes to docs/WINDOW_BANK_r12.md.
Absence of that file at round end = no certifiable window appeared (the
r10/r11 outcome). Runs until DEADLINE_S elapses or a bank completes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = float(os.environ.get("GATE", "5"))
PERIOD_S = float(os.environ.get("PERIOD_S", "300"))
DEADLINE_S = float(os.environ.get("DEADLINE_S", str(5 * 3600)))
ROUND = os.environ.get("ROUND", "r13")
LOG = os.path.join(ROOT, "docs", f"window_hunt_{ROUND}.jsonl")
BANK = os.path.join(ROOT, "docs", f"WINDOW_BANK_{ROUND}.md")


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "window_probe.py")],
        capture_output=True, text=True, timeout=300,
    )
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    d["t"] = round(time.time())
    return d


def run(cmd: list[str], env: dict | None = None, timeout: float = 3600) -> str:
    e = dict(os.environ)
    e.update(env or {})
    r = subprocess.run(
        cmd, capture_output=True, text=True, env=e, timeout=timeout, cwd=ROOT
    )
    return r.stdout[-8000:] + ("\n[stderr tail]\n" + r.stderr[-1500:] if r.returncode else "")


def safe_probe() -> dict:
    try:
        return probe()
    except Exception as e:  # a failed mid-probe must not abort the bank
        return {"error": str(e)}


def bank(p0: dict) -> None:
    py = sys.executable
    tool = lambda name: os.path.join(ROOT, "tools", name)  # noqa: E731
    sections = [("pre-bank probe", json.dumps(p0))]
    sections.append((
        "768d IVF build (1M x 768d; bar >=40k rows/s)",
        run([py, tool("profile_build.py")], {"ROWS": "1000000", "DIM": "768"}),
    ))
    sections.append(("mid probe", json.dumps(safe_probe())))
    sections.append((
        "graph 1M x 64d build (bar >=17k rows/s)",
        run([py, tool("profile_graph_serving.py"), "1000000"]),
    ))
    sections.append(("mid probe 2", json.dumps(safe_probe())))
    sections.append((
        "SemDeDup f32 arm (1M x 768d, k=10240; banked f64 280.6s r08)",
        run([py, tool("profile_semdedup.py")], {"PRECISE": "0"}),
    ))
    sections.append(("post-bank probe", json.dumps(safe_probe())))
    with open(BANK, "w") as f:
        f.write(f"# WINDOW_BANK {ROUND} — certified-window banking runs\n\n")
        f.write(f"Gate: parallel_scale_24t >= {GATE} (clean host 18-22x).\n\n")
        for title, body in sections:
            f.write(f"## {title}\n\n```\n{body}\n```\n\n")


def main() -> None:
    t0 = time.time()
    n = 0
    while time.time() - t0 < DEADLINE_S:
        try:
            p = probe()
        except Exception as e:  # keep hunting through transient failures
            p = {"error": str(e), "t": round(time.time())}
        n += 1
        with open(LOG, "a") as f:
            f.write(json.dumps(p) + "\n")
        scale = p.get("parallel_scale_24t", 0)
        print(f"probe {n}: scale={scale}", flush=True)
        if scale >= GATE:
            print("GATE PASSED — banking", flush=True)
            bank(p)
            return
        time.sleep(PERIOD_S)
    print(f"deadline reached after {n} probes, nothing certifiable", flush=True)


if __name__ == "__main__":
    main()
