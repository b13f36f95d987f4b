#!/usr/bin/env python3
"""Self-attesting leak scan over the repo's tracked source.

Re-runs the seven leak categories the round gate checks and writes
LEAKCHECK.json with provenance (scanned-at commit + UTC timestamp), so the
artifact is verifiable against a specific tree state rather than a bare
round number.

Usage: python3 scripts/leakcheck.py <round-number>
"""
import json
import re
import subprocess
import sys
import datetime
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent

CATEGORIES = {
    # anything importing from a non-public namespace
    "internal-import": re.compile(
        r"^\s*import\s+(?:com\.anthropic|anthropic\.|ant\.|internal\.)", re.M),
    # URLs that are not public docs/specs
    "internal-url": re.compile(
        r"https?://[\w.-]*(?:\.corp\.|internal\.|\.ant\.dev|anthropic\.com/internal)"),
    "internal-pkg2": re.compile(
        r"(?:libraryDependencies|resolvers)\s*\+=.*(?:corp|internal|artifactory)", re.I),
    "internal-bucket": re.compile(
        r"(?:s3|gs)://(?!mybucket|my-bucket|bucket|test|example|fake)[\w.-]*(?:internal|corp|anthropic)[\w.-]*"),
    "slack-link": re.compile(r"slack\.com/archives|#[a-z0-9-]*claude[a-z0-9-]*"),
    "api-key": re.compile(r"(?:sk-ant-|AKIA[0-9A-Z]{16}|xox[baprs]-)"),
    "axon-env": re.compile(r"\b(?:AXON_[A-Z_]+|CLAUDE_INTERNAL_[A-Z_]+)\b"),
}

SCAN_EXT = {".scala", ".sbt", ".md", ".py", ".json", ".yaml", ".yml", ".sh", ".conf"}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, capture_output=True,
                         text=True, check=True).stdout
    return [f for f in out.splitlines() if pathlib.Path(f).suffix in SCAN_EXT
            and not f.startswith("LEAKCHECK")]


def mask_own_patterns(text):
    """Blank ONLY the CATEGORIES pattern-literal block of this file so the
    scanner covers its own executable content (a real leak string anywhere
    else in leakcheck.py must fail the gate), while its regex literals
    don't self-match. Line positions are preserved so hit line numbers
    stay accurate. Refuses to attest if the block markers are not found
    exactly as expected — a reformat must not silently blank the rest of
    the scanner (masking the whole file would pass any leak) or stop
    masking (pattern literals would self-hit)."""
    lines = text.split("\n")
    out, masking, started, ended = [], False, False, False
    for ln in lines:
        if ln.startswith("CATEGORIES = {"):
            masking, started = True, True
        end = masking and ln.startswith("}")
        out.append("" if masking else ln)
        if end:
            masking, ended = False, True
    if not started or not ended or masking:
        raise RuntimeError(
            "leakcheck self-mask could not delimit the CATEGORIES block "
            "(started=%s ended=%s) - refusing to attest a partial scan"
            % (started, ended))
    return "\n".join(out)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True, check=True).stdout.strip()
    hits = {k: [] for k in CATEGORIES}
    for f in tracked_files():
        try:
            text = (ROOT / f).read_text(errors="replace")
        except OSError:
            continue
        if f == "scripts/leakcheck.py":
            text = mask_own_patterns(text)
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}:{m.group(0)[:80]}")
    n = sum(len(v) for v in hits.values())
    out = {
        "round": rnd,
        "n_hits": n,
        "hits": hits,
        "scanned_at_commit": commit,
        "scanned_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "scanner": "scripts/leakcheck.py",
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"LEAKCHECK.json: round={rnd} n_hits={n} commit={commit[:12]}")
    return 0 if n == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
