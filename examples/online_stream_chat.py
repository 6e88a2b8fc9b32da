"""Streaming chat against a running OpenAI server
(reference examples/online_stream_chat.py)."""

import os
import sys

# runnable straight from a checkout (no install step)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import argparse
import json

import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8080")
    ap.add_argument("--prompt", default="Tell me about TPUs.")
    args = ap.parse_args()

    body = json.dumps({
        "messages": [{"role": "user", "content": args.prompt}],
        "max_tokens": 256,
        "stream": True,
    }).encode()
    req = urllib.request.Request(
        f"{args.url}/v1/chat/completions", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data:"):
                continue
            payload = line[5:].strip()
            if payload == "[DONE]":
                break
            delta = json.loads(payload)["choices"][0]["delta"]
            print(delta.get("content") or "", end="", flush=True)
    print()


if __name__ == "__main__":
    main()
