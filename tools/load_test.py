"""Concurrent-load driver for the web server: fires N synthesis requests at
once, polls task status, and reports completion latency percentiles plus the
number of engine calls the server actually made (visible in its log as
"batched inference" lines when --batch-requests > 1).

Usage (server already running):
    python tools/load_test.py --url http://127.0.0.1:5078 \
        --prompt tests/sample_prompt.wav -n 8 --concurrency 8 \
        --max-mel-tokens 10

With the server started via `--batch-requests 8`, the N requests merge into
~N/batch engine calls; with the default (serialize, reference behavior) the
same load runs one request at a time — compare the p95 and total wall.
No external dependencies (urllib + threads).
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request
import uuid


def multipart(fields, files):
    boundary = uuid.uuid4().hex
    buf = io.BytesIO()
    for k, v in fields.items():
        buf.write(f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n'.encode())
    for k, (fname, data) in files.items():
        buf.write(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"; filename="{fname}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n".encode()
        )
        buf.write(data)
        buf.write(b"\r\n")
    buf.write(f"--{boundary}--\r\n".encode())
    return buf.getvalue(), f"multipart/form-data; boundary={boundary}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:5078")
    ap.add_argument("--prompt", default="tests/sample_prompt.wav")
    ap.add_argument("-n", "--requests", type=int, default=8)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-mel-tokens", type=int, default=40)
    ap.add_argument("--timeout-s", type=float, default=600.0)
    ap.add_argument("--do-sample", default="true")
    ap.add_argument("--stream", action="store_true",
                    help="hit /api/synthesize-stream instead and report "
                         "TIME-TO-FIRST-AUDIO percentiles (first body chunk "
                         "after the RIFF header) — the latency SLO metric "
                         "for --slot-batching streaming serving")
    args = ap.parse_args()

    with open(args.prompt, "rb") as f:
        wav = f.read()

    lat, lock = [], threading.Lock()
    sem = threading.Semaphore(args.concurrency)

    def _one_inner(i):
        body, ctype = multipart(
            {
                "text": f"LOAD TEST REQUEST NUMBER {i}.",
                "do_sample": args.do_sample, "top_k": "30", "num_beams": "1",
                "max_mel_tokens": str(args.max_mel_tokens),
                "infer_mode": "普通推理",
            },
            {"referenceAudioFile": ("p.wav", wav)},
        )
        req = urllib.request.Request(
            args.url + "/api/synthesize", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            task_id = json.load(r)["task_id"]
        deadline = time.perf_counter() + args.timeout_s
        status = "timeout"
        while time.perf_counter() < deadline:
            with urllib.request.urlopen(
                args.url + f"/api/task-status/{task_id}", timeout=60
            ) as r:
                st = json.load(r)
            status = st.get("status")
            if status in ("completed", "failed"):
                break
            time.sleep(0.25)
        return status

    ttfa, ttfa_lock = [], threading.Lock()

    def _one_stream(i):
        """POST the stream endpoint; record time to the FIRST PCM byte
        (after the 44-byte RIFF header) and drain the rest. 'completed' iff
        any PCM arrived."""
        body, ctype = multipart(
            {
                "text": f"STREAM LOAD TEST REQUEST NUMBER {i}.",
                "do_sample": args.do_sample, "top_k": "30",
                "max_mel_tokens": str(args.max_mel_tokens),
            },
            {"referenceAudioFile": ("p.wav", wav)},
        )
        req = urllib.request.Request(
            args.url + "/api/synthesize-stream", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        t0 = time.perf_counter()
        got_pcm = 0
        with urllib.request.urlopen(req, timeout=args.timeout_s) as r:
            seen = 0
            first = None
            while True:
                chunk = r.read(4096)
                if not chunk:
                    break
                seen += len(chunk)
                if first is None and seen > 44:
                    first = time.perf_counter() - t0
                got_pcm = seen - 44
            if first is not None and got_pcm > 0:
                with ttfa_lock:
                    ttfa.append(first)
        return "completed" if got_pcm > 0 else "empty"

    def one(i):
        with sem:
            t0 = time.perf_counter()
            try:
                status = _one_stream(i) if args.stream else _one_inner(i)
            except Exception as e:  # connection refused, 5xx, timeout...
                status = f"error: {e}"
            with lock:
                lat.append((i, status, time.perf_counter() - t0))

    t_all = time.perf_counter()
    threads = [threading.Thread(target=one, args=(i,)) for i in range(args.requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_all

    ok = [d for _, s, d in lat if s == "completed"]
    bad = [(i, s) for i, s, _ in lat if s != "completed"]
    ok.sort()
    pct = lambda p: ok[min(len(ok) - 1, int(p * len(ok)))] if ok else float("nan")
    out = {
        "requests": args.requests, "completed": len(ok), "failed": bad,
        "wall_s": round(wall, 2),
        "latency_p50_s": round(pct(0.50), 2) if ok else None,
        "latency_p95_s": round(pct(0.95), 2) if ok else None,
        "latency_max_s": round(max(ok), 2) if ok else None,
        "throughput_req_per_s": round(len(ok) / wall, 3) if ok else 0.0,
    }
    if args.stream and ttfa:
        ttfa.sort()
        tpct = lambda p: ttfa[min(len(ttfa) - 1, int(p * len(ttfa)))]
        out.update({
            "ttfa_p50_s": round(tpct(0.50), 3),
            "ttfa_p95_s": round(tpct(0.95), 3),
            "ttfa_max_s": round(max(ttfa), 3),
        })
    print(json.dumps(out))
    sys.exit(0 if not bad else 1)


if __name__ == "__main__":
    main()
