#!/usr/bin/env python3
"""Local mirror of the driver's leak check, with provenance fields.

Scans the repo's own sources (src/, tools/, build.sbt, top-level docs
except the retrieved-content files PAPERS.md/SNIPPETS.md) for the same
seven classes the driver's LEAKCHECK.json reports, and writes an
artifact that also carries generated_at and tool_version (the r18
advisor note: a bare round-stamp artifact can't be audited for
freshness). Patterns here are generic leak SHAPES — nothing
proprietary is named, which is the point.

Usage: leakcheck.py [jsonOut=LEAKCHECK_local.json]
"""
import datetime
import json
import os
import re
import sys

TOOL_VERSION = "1.0 (round 20)"

# URL hosts that are legitimately public for this project
PUBLIC_HOSTS = (
    r"(?:www\.)?(?:github\.com|apache\.org|spark\.apache\.org|"
    r"duckdb\.org|scala-lang\.org|scalatest\.org|arxiv\.org|"
    r"doi\.org|acm\.org|vldb\.org|openproceedings\.org|w3\.org|"
    r"wikipedia\.org|example\.com|localhost)")

CLASSES = {
    # imports under a corp-style reversed-domain root that is neither
    # this repo, the JDK, Scala, the Spark/Hadoop ecosystem, nor the
    # test libs (locally-scoped val imports like `spark.implicits._`
    # have no such root and don't match)
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|ai|co|dev)\."
        r"(?!fasterxml|github)[a-z0-9_.]+", re.M),
    # URLs whose host is not on the public allowlist
    "internal-url": re.compile(
        r"https?://(?!" + PUBLIC_HOSTS + r")[A-Za-z0-9.-]+\.[a-z]{2,}"),
    # package coordinates under a corp-style reversed domain that is
    # not an OSS ecosystem root
    "internal-pkg2": re.compile(
        r"\"(?:com|net|io)\.(?!fasterxml|github)[a-z0-9]+\.[a-z0-9.]+\""
        r"\s*%+\s*\""),
    # cloud bucket references
    "internal-bucket": re.compile(r"(?:s3a?|gs|abfss?|wasbs?)://[A-Za-z0-9._-]+"),
    # slack links / channel ids / go-links
    "slack-link": re.compile(
        r"(?:slack\.com/archives/[A-Z0-9]+|(?<![A-Za-z0-9])#[a-z0-9-]*slack"
        r"|(?<![A-Za-z0-9/])go/[a-z][a-z0-9-]{2,})"),
    # credential-shaped strings
    "api-key": re.compile(
        r"(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,}"
        r"|xox[baprs]-[A-Za-z0-9-]{10,}|AIza[0-9A-Za-z_-]{30,})"),
    # suspicious env-var prefixes (anything not the repo's own
    # SPARK_/ORACLE_/COURSIER_/JAVA_/SBT_ knobs)
    "axon-env": re.compile(
        r"sys\.env\(\s*\"(?!SPARK_|ORACLE_|COURSIER_|JAVA_|SBT_|PATH)"
        r"[A-Z][A-Z0-9_]*\"\s*\)"),
}

SKIP = {"PAPERS.md", "SNIPPETS.md"}  # retrieved public content


def files(root="."):
    for base in ("src", "tools"):
        for d, _, fs in os.walk(os.path.join(root, base)):
            for f in fs:
                if f.endswith((".scala", ".py", ".sh", ".sbt", ".md")):
                    yield os.path.join(d, f)
    for f in os.listdir(root):
        if f.endswith((".md", ".sbt")) and f not in SKIP:
            yield os.path.join(root, f)


def main(out="LEAKCHECK_local.json"):
    hits = {k: [] for k in CLASSES}
    me = os.path.abspath(__file__)
    for path in files():
        if os.path.abspath(path) == me:
            continue  # the patterns themselves
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for cls, rx in CLASSES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cls].append(f"{path}:{line}: {m.group(0)[:80]}")
    n = sum(len(v) for v in hits.values())
    artifact = {
        "generated_at": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "tool_version": TOOL_VERSION,
        "n_hits": n,
        "hits": hits,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2, sort_keys=True)
    print(f"{n} hits -> {out}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
