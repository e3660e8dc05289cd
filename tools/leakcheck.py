#!/usr/bin/env python3
"""Reproducible leak scan over the repo's own sources.

The certification artifact LEAKCHECK.json asserts zero internal/proprietary
references; this tool IS the reproducible evidence behind that claim — the
exact pattern set is embedded in the output, so any reviewer can re-run:

    python3 tools/leakcheck.py            # scan src/ tools/ *.md *.sbt
    python3 tools/leakcheck.py --round 9  # stamp the round field

Every pattern below is GENERIC (shape-based, public knowledge): the scan
flags suspicious *categories* — non-public imports, cloud-bucket URIs,
non-allowlisted URLs/env vars, secret-shaped strings — not a blocklist of
names (a blocklist of internal names would itself be a leak).
"""
import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Files worth scanning: sources, build, docs, tools.
GLOBS = ["src/**/*.scala", "tools/**/*.py", "tools/**/*.sh", "*.sbt",
         "project/*.scala", "project/*.sbt", "*.md"]

# Public packages this project may legitimately import.
IMPORT_ALLOW = re.compile(
    r"^import\s+(org\.apache\.spark|org\.apache\.hadoop|org\.apache\.parquet|"
    r"org\.json4s|scala\b|scala\.|java\.|javax\.|"
    r"org\.scalatest|org\.scalacheck|graft\b|graft\.)")
# Only imports rooted at a real package TLD can name an external artifact;
# value imports of locals (`import spark.implicits._`) are not packages.
IMPORT_ROOTED = re.compile(r"^import\s+(?:org|com|net|io|ai|dev|co|gov|edu|biz)\.")

# Public hosts that may appear in comments/docs (format specs, papers, ASF).
# The host must END after the allowed name ((?=[/:#?\s]|$)) — a bare \b
# anchor matches at '.' or '-', so github.com.corp-mirror.net or
# localhost-evil.net would pass a prefix-only allowlist.
URL_ALLOW = re.compile(
    r"https?://(www\.)?(apache\.org|spark\.apache\.org|github\.com|arxiv\.org|"
    r"doi\.org|w3\.org|ietf\.org|example\.com|localhost|127\.0\.0\.1|"
    r"en\.wikipedia\.org|duckdb\.org|scala-lang\.org|scalatest\.org|"
    r"docs\.oracle\.com)(?=[/:#?\s]|$)")

# Env vars this project may read (documented in README/build.sbt).
ENV_ALLOW = re.compile(
    r"^(SPARK_GRAFT_\w+|SPARK_DRIVER_MEM|JAVA_\w+|COURSIER_\w+|PATH|HOME|"
    r"USER|LANG|TZ|TMPDIR)$")

CATEGORIES = {
    # any import outside the public allowlist (run per import line)
    "internal-import": None,  # special-cased below
    # URLs whose host is not on the public allowlist (run per URL found)
    "internal-url": None,     # special-cased below
    # company-internal package shapes: com.<corp>.internal..., *.corp.*
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.[a-z0-9]+\.(?:internal|corp|private)\b"),
    # cloud bucket / internal-filesystem URIs
    "internal-bucket": re.compile(
        r"\b(?:gs|s3|s3a|s3n|abfss|wasbs)://[\w.-]+"),
    # slack links and go/-style shortlinks
    "slack-link": re.compile(
        r"\b[\w-]+\.slack\.com\b|\bslack://|(?<![\w/.-])go/[a-z][\w-]{2,}\b"),
    # secret-shaped strings: AWS key ids, PEM blocks, long opaque tokens
    "api-key": re.compile(
        r"\bAKIA[0-9A-Z]{16}\b|-----BEGIN [A-Z ]*PRIVATE KEY-----|"
        r"\b(?:api|secret|access)[_-]?key\s*[:=]\s*['\"][A-Za-z0-9+/]{20,}"),
    # env-var reads outside the documented allowlist
    "axon-env": None,         # special-cased below
}

ENV_READ = re.compile(r"""sys\.env(?:\.getOrElse|\.get)?\s*\(\s*"(\w+)"|"""
                      r"""System\.getenv\s*\(\s*"(\w+)"|os\.environ(?:\.get)?\s*[\[(]\s*['"](\w+)""")
URL_FIND = re.compile(r"https?://[\w.-]+")


def scan():
    hits = {k: [] for k in CATEGORIES}
    files = sorted({p for g in GLOBS for p in ROOT.glob(g) if p.is_file()})
    self_path = Path(__file__).resolve()
    for p in files:
        if p.resolve() == self_path:
            continue  # the scanner's own pattern/allowlist literals
        rel = str(p.relative_to(ROOT))
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for ln, line in enumerate(text.splitlines(), 1):
            where = f"{rel}:{ln}"
            s = line.strip()
            if rel.endswith(".scala") and IMPORT_ROOTED.match(s):
                if not IMPORT_ALLOW.match(s):
                    hits["internal-import"].append(f"{where}: {s[:120]}")
            for m in URL_FIND.finditer(line):
                # URL_FIND's [\w.-]+ swallows a sentence-ending '.' — strip
                # trailing punctuation so 'see https://github.com.' stays
                # allowlisted under the host-end anchor
                url = m.group(0).rstrip(".,;:")
                if not URL_ALLOW.match(url):
                    hits["internal-url"].append(f"{where}: {url[:120]}")
            for m in ENV_READ.finditer(line):
                var = next(g for g in m.groups() if g)
                if not ENV_ALLOW.match(var):
                    hits["axon-env"].append(f"{where}: {var}")
            for cat, rx in CATEGORIES.items():
                if rx is not None and rx.search(line):
                    hits[cat].append(f"{where}: {s[:120]}")
    return files, hits


def infer_round():
    """The round being BUILT: one past the newest judged artifact. Makes a
    standalone run stamp the same round the committed artifact carries, so
    the two are byte-comparable (a bare run used to stamp null).
    """
    rounds = [int(m.group(1)) for p in ROOT.glob("CORRECTNESS_r*.json")
              if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", p.name))]
    return max(rounds) + 1 if rounds else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="override the round stamp (default: inferred as "
                         "newest CORRECTNESS_r<N>.json + 1)")
    ap.add_argument("--out", default=None, help="write JSON here (default stdout)")
    args = ap.parse_args()
    if args.round is None:
        args.round = infer_round()
    files, hits = scan()
    try:
        commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                                capture_output=True, text=True).stdout.strip()
    except OSError:
        commit = "unknown"
    out = {
        "round": args.round,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "scan": {
            "tool": "tools/leakcheck.py",
            "commit": commit,
            "n_files_scanned": len(files),
            "globs": GLOBS,
            "import_allowlist": IMPORT_ALLOW.pattern,
            "url_allowlist": URL_ALLOW.pattern,
            "env_allowlist": ENV_ALLOW.pattern,
            "patterns": {k: (v.pattern if v is not None else "see tool source")
                         for k, v in CATEGORIES.items()},
        },
    }
    text = json.dumps(out, indent=2)
    if args.out:
        Path(args.out).write_text(text + "\n")
    else:
        print(text)
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
