"""AI commit-message generation.

Capability parity with reference src/ai.rs: capture `git diff --cached`,
refuse empty, shell out to `claude -p … --model haiku --output-format
json`, parse `{"result"}`, split subject/body at the first blank line,
clamp the subject to 72 chars; provider enum for future backends.
"""

from __future__ import annotations

import json
import queue
import shutil
import subprocess
import threading
from typing import Optional

from ..gitcore.diff import staged_diff_text
from ..gitcore.repo import GitRepo

SUBJECT_CLAMP = 72  # reference: ai.rs:187
MAX_DIFF_BYTES = 200_000

PROMPT = (
    "Write a git commit message for this staged diff. First line: concise "
    "subject (<72 chars, imperative mood). Optionally after a blank line: "
    "a short body. Output ONLY the commit message.\n\nDiff:\n"
)


def find_claude_binary() -> Optional[str]:
    """reference: ai.rs:110 binary discovery."""
    return shutil.which("claude")


def split_subject_body(text: str) -> tuple[str, str]:
    """Split at the first blank line; clamp subject (reference: ai.rs:180)."""
    text = text.strip()
    if not text:
        return "", ""
    parts = text.split("\n\n", 1)
    first_block = parts[0].strip()
    lines = first_block.split("\n")
    subject = lines[0].strip()
    rest = "\n".join(lines[1:]).strip()
    body = (rest + ("\n\n" if rest and len(parts) > 1 else "")
            + (parts[1].strip() if len(parts) > 1 else "")).strip()
    if len(subject) > SUBJECT_CLAMP:
        cut = subject[:SUBJECT_CLAMP]
        if " " in cut[40:]:
            cut = cut[:cut.rfind(" ")]
        body = (subject[len(cut):].strip() + ("\n" + body if body else "")).strip()
        subject = cut.rstrip() + "…" if not cut.endswith("…") else cut
    return subject, body


def generate_via_claude_cli(diff: str, model: str = "haiku",
                            timeout: float = 120.0) -> dict:
    """reference: ai.rs:130-194 (claude_cli::generate)."""
    binary = find_claude_binary()
    if binary is None:
        return {"ok": False, "error": "claude CLI not found in PATH"}
    try:
        proc = subprocess.run(
            [binary, "-p", PROMPT + diff, "--model", model,
             "--output-format", "json"],
            capture_output=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "AI generation timed out"}
    if proc.returncode != 0:
        return {"ok": False,
                "error": proc.stderr.decode("utf-8", "replace")[:200]
                or "claude CLI failed"}
    try:
        payload = json.loads(proc.stdout.decode("utf-8", "replace"))
        result = payload.get("result", "")
    except json.JSONDecodeError:
        result = proc.stdout.decode("utf-8", "replace")
    subject, body = split_subject_body(result)
    if not subject:
        return {"ok": False, "error": "AI returned an empty message"}
    return {"ok": True, "subject": subject, "body": body}


def spawn_generate_async(repo: GitRepo, proxy=None,
                         provider: str = "claude-cli"
                         ) -> Optional["queue.Queue[dict]"]:
    """Returns None when nothing is staged (reference: ai.rs refuses empty
    diffs before spawning)."""
    diff = staged_diff_text(repo, MAX_DIFF_BYTES)
    if not diff.strip():
        return None
    rx: "queue.Queue[dict]" = queue.Queue(maxsize=1)

    def worker():
        result = generate_via_claude_cli(diff)
        rx.put(result)
        if proxy is not None:
            proxy.send_event()

    threading.Thread(target=worker, daemon=True, name="ai-generate").start()
    return rx
