#!/usr/bin/env python3
"""Leak scanner: sweeps the repo's source for anything that looks like a
non-public reference (internal package imports, private URLs/hosts,
bucket URIs, chat permalinks, credential-shaped strings, suspicious env
vars) and writes LEAKCHECK.json WITH run evidence (timestamp, file count,
git SHA) so a round bump is distinguishable from a hand edit.

Usage:  python3 tools/leakcheck.py <round-number> [repo-root]
"""
import json
import os
import re
import subprocess
import sys
import time

# Pattern classes. Everything here is generic/public: the scanner flags
# SHAPES (bucket URIs, credential prefixes, permalink hosts), not any
# specific organization's names.
PATTERNS = {
    # imports rooted in a reverse-domain namespace that is not a public
    # ecosystem (value/session imports like `import spark.implicits._`
    # are not package roots and are out of scope)
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|co|ai|dev|biz)\.(?!fasterxml\.|sun\.|github\.)\S+",
        re.M),
    # URLs to anything that is not a public docs/code host or an
    # RFC 2606 documentation/placeholder domain
    "internal-url": re.compile(
        r"https?://(?!(?:www\.)?(?:github\.com|duckdb\.org|spark\.apache\.org|kafka\.apache\.org|avro\.apache\.org|arxiv\.org|docs\.oracle\.com|openjdk\.org|scala-lang\.org|en\.wikipedia\.org|dl\.acm\.org|doi\.org|localhost)(?![A-Za-z0-9.\-_])|[A-Za-z0-9.\-]*example\.(?:com|org|net)|[A-Za-z0-9.\-]+\.(?:test|invalid|local)\b)[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    # second-level package roots that are not public ecosystems
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?!fasterxml|sun\b|github)[a-z][a-z0-9]{2,}\.(?:internal|private|corp)\b"),
    # object-store bucket URIs
    "internal-bucket": re.compile(r"\b(?:s3|gs|s3a|s3n|abfss?|wasbs?)://[A-Za-z0-9._\-]+"),
    # chat permalinks / shortlink services
    "slack-link": re.compile(r"\b(?:[a-z0-9\-]+\.slack\.com|hooks\.slack\.com|go/[a-z][a-z0-9\-]+)\b"),
    # credential shapes: AWS key ids, slack/github tokens, PEM blocks
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|xox[abprs]-[0-9A-Za-z\-]{10,}|ghp_[0-9A-Za-z]{36}|-----BEGIN (?:RSA |EC )?PRIVATE KEY-----)"),
    # env vars suggesting a non-public deployment knob (outside the
    # documented SPARK_GRAFT_* surface)
    "axon-env": re.compile(r"\bsys\.env\([\"'](?!SPARK_GRAFT_|SPARK_|JAVA_|PATH\b)[A-Z0-9_]{4,}[\"']\)"),
}

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "README.md", "SURVEY.md", "MIGRATION.md",
              "SCALE.md", "FIXTURES.md", "TESTDATA.md"]
EXT = {".scala", ".sbt", ".py", ".md", ".json", ".conf", ".properties", ".java"}


def iter_files(root):
    for d in SCAN_DIRS:
        for dirpath, _, names in os.walk(os.path.join(root, d)):
            for n in names:
                if os.path.splitext(n)[1] in EXT:
                    yield os.path.join(dirpath, n)
    for f in SCAN_FILES:
        p = os.path.join(root, f)
        if os.path.exists(p):
            yield p


def main():
    # the round number is REQUIRED: round 10 shipped a "-1" placeholder
    # stamp because the unset default leaked into the committed artifact,
    # breaking round traceability — fail loudly instead.
    if len(sys.argv) < 2:
        sys.exit("usage: leakcheck.py <round-number> [repo-root] "
                 "(round is required; an unset round must not be stamped)")
    rnd = int(sys.argv[1])
    if rnd < 1:
        sys.exit(f"invalid round number: {rnd} (must be >= 1)")
    root = sys.argv[2] if len(sys.argv) > 2 else "."
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    for path in iter_files(root):
        n_files += 1
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        rel = os.path.relpath(path, root)
        for key, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[key].append(f"{rel}:{line}:{m.group(0)[:80]}")
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                             capture_output=True, text=True).stdout.strip()
    except OSError:
        sha = None
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "run_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files_scanned": n_files,
        "git_sha": sha,
        "tool": "tools/leakcheck.py",
    }
    with open(os.path.join(root, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"[leakcheck] round={rnd} files={n_files} hits={out['n_hits']}")
    for k, v in hits.items():
        for h in v[:20]:
            print(f"  {k}: {h}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
