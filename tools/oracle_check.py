#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB correctness gate.

Usage:
  python3 tools/oracle_check.py <sfDir> <verifyOutDir>
  python3 tools/oracle_check.py --changed [--base REF] <sfDir> <verifyOutDir>

Loads each <name>.parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet tables, and compares values column-name-sorted. NOT part of
the shipped Scala library — it exists so oracle mismatches surface
before the driver runs the real gate.

--changed (r10): resolve the git diff to the affected catalog queries
and compare ONLY those, so the in-round loop is minutes instead of a
287-query sweep. Resolution: changed main-source files -> their
top-level objects -> reverse-reference closure over the object graph
(`X.` qualified use or the snake_case SQL-surface name) -> Queries
member blocks referencing any affected object, plus members whose
lines the Queries.scala diff touches directly (helpers close
transitively through member references). Any unmappable change (core
session/entry files, build.sbt, non-Scala sources) falls back to the
FULL gate — --changed is an iteration aid; the full run stays the
round-close authority.
"""
import json
import re
import subprocess
import sys
import glob
import os

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_PATH = "src/main/scala/graft/Queries.scala"
# A change here can affect any query through session conf / table
# readers / SQL function registration / the harness itself.
CORE_FILES = {
    "src/main/scala/graft/SparkEntry.scala",
    "src/main/scala/graft/Verify.scala",
    "src/main/scala/graft/GraftSession.scala",
    "src/main/scala/graft/GraftExtensions.scala",
    "build.sbt",
}


def git(args):
    return subprocess.run(["git"] + args, cwd=REPO, check=True,
                          capture_output=True, text=True).stdout


def snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def top_level_names(text: str):
    return re.findall(
        r"^(?:final\s+)?(?:case\s+)?(?:class|object|trait)\s+(\w+)",
        text, re.M)


def changed_files(base):
    """Returns (files, effective_base) — the base the LINE-RANGE diffs
    must also use (on a clean tree the fallback is the last commit,
    and diffing ranges against HEAD there would seed nothing)."""
    if base:
        files = git(["diff", "--name-only", base]).split()
        eff = base
    else:
        files = git(["diff", "--name-only", "HEAD"]).split()
        eff = "HEAD"
        if not files:  # clean tree: check the last commit instead
            files = git(["diff", "--name-only", "HEAD~1..HEAD"]).split()
            eff = "HEAD~1"
    return ([f for f in files if os.path.exists(os.path.join(REPO, f))],
            eff)


def changed_line_ranges(path, base):
    """(start, end) 1-based new-file line ranges touched for `path`."""
    ref = base if base else "HEAD"
    try:
        diff = git(["diff", "-U0", ref, "--", path])
    except subprocess.CalledProcessError:
        return None
    ranges = []
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@",
                         diff, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        # a pure deletion (n=0) still touches the surrounding member
        ranges.append((start, start + max(n, 1) - 1))
    return ranges


def parse_top_level(text):
    """Top-level (indent 0) object/class/trait spans:
    [(kind, name, start_line, end_line)]."""
    lines = text.split("\n")
    decl_re = re.compile(
        r"^(?:final\s+)?(?:case\s+)?(?:abstract\s+)?"
        r"(object|class|trait)\s+(\w+)")
    decls = []
    for i, ln in enumerate(lines):
        m = decl_re.match(ln)
        if m:
            decls.append((m.group(1), m.group(2), i + 1))
    spans = []
    for j, (kind, name, start) in enumerate(decls):
        end = decls[j + 1][2] - 1 if j + 1 < len(decls) else len(lines)
        spans.append((kind, name, start, end))
    return spans


def resolve_changed_queries(base=None):
    """Returns (affected_query_names or None for full-run, reason).

    Granularity is (Object, member): a diff touching only
    Dedup.allPairsCosine does NOT fan out through Dedup.MinhashP's many
    constant readers. Unattributable lines (imports, class bodies,
    file headers) degrade to whole-object; unmappable files degrade to
    the full gate.
    """
    files, base = changed_files(base)
    if not files:
        return set(), "no changes detected"
    relevant = [f for f in files
                if not f.startswith("src/test/")
                and not f.startswith("tools/")
                and not f.startswith(".claude/")
                and not f.endswith((".md", ".json", ".jsonl", ".txt"))]
    if not relevant:
        return set(), "only tests/docs/tools changed"
    unmappable = [f for f in relevant
                  if not (f.startswith("src/main/scala/") and
                          f.endswith(".scala"))]
    if unmappable:
        return None, f"unmappable change: {unmappable[:3]}"
    if any(f in CORE_FILES for f in relevant):
        return None, "core session/entry file changed"

    # ---- parse every main source into (object, member) units -------
    all_files = glob.glob(os.path.join(
        REPO, "src/main/scala", "**", "*.scala"), recursive=True)
    # obj -> {member -> body}; obj -> kind; Queries handled as an obj
    obj_members, obj_kind, file_objs = {}, {}, {}
    member_re = re.compile(
        r"^  (?:override\s+)?(?:private(?:\[\w+\])?\s+)?(?:lazy\s+)?"
        r"(?:val|def|var)\s+(\w+)")
    for f in all_files:
        rel = os.path.relpath(f, REPO)
        text = open(f).read()
        file_objs[rel] = []
        for kind, name, start, end in parse_top_level(text):
            lines = text.split("\n")[start - 1:end]
            obj_kind[name] = kind
            file_objs[rel].append((name, start, end))
            mem = {}
            decls = [(member_re.match(ln).group(1), i)
                     for i, ln in enumerate(lines)
                     if member_re.match(ln)]
            for j, (mn, off) in enumerate(decls):
                moff = decls[j + 1][1] if j + 1 < len(decls) else len(lines)
                # later duplicate decls (overloads) merge bodies
                mem[mn] = mem.get(mn, "") + "\n".join(lines[off:moff])
            # object preamble (before the first member) attributes to a
            # synthetic member "" — changes there affect whole object
            preamble_end = decls[0][1] if decls else len(lines)
            mem[""] = "\n".join(lines[:preamble_end])
            obj_members[name] = (mem, start,
                                 [(mn, start + off) for mn, off in decls])

    # SQL-surface aliases: GraftExtensions pairs
    # FunctionIdentifier("sql_name") with classOf[ClassName] — those
    # registered names are how queries invoke expressions via
    # expr("minhash_sig(...)"), so a class change must fan out through
    # its registered alias, not a guessed snake_case rendering.
    sql_alias = {}
    ext = open(os.path.join(
        REPO, "src/main/scala/graft/GraftExtensions.scala")).read()
    for m in re.finditer(
            r'FunctionIdentifier\("(\w+)"\),\s*\n?\s*new '
            r'ExpressionInfo\(classOf\[(\w+)\]', ext):
        sql_alias.setdefault(m.group(2), []).append(m.group(1))

    # ---- seed: units the diff touches ------------------------------
    # unit = (obj, member); member "" means the whole object
    seeds = set()
    for f in relevant:
        ranges = changed_line_ranges(f, base)
        if ranges is None:
            return None, f"could not diff {f}"
        for obj, ostart, oend in file_objs.get(f, []):
            mem, _, decl_lines = obj_members[obj]
            # member spans in absolute lines
            spans = []
            for j, (mn, mline) in enumerate(decl_lines):
                mend = (decl_lines[j + 1][1] - 1
                        if j + 1 < len(decl_lines) else oend)
                spans.append((mn, mline, mend))
            for (a, b) in ranges:
                if b < ostart or a > oend:
                    continue
                hit_member = False
                for mn, ms, me in spans:
                    if a <= me and b >= ms:
                        seeds.add((obj, mn))
                        hit_member = True
                # lines in the object but before any member (doc
                # comment, constructor params, preamble) -> whole obj
                first_member = spans[0][1] if spans else oend + 1
                if a < first_member and b >= ostart:
                    seeds.add((obj, ""))
                if not hit_member and not spans:
                    seeds.add((obj, ""))
        # changed lines outside every top-level span (imports/header)
        # -> every object in the file, wholesale
        covered = [(s, e) for _, s, e in file_objs.get(f, [])]
        for (a, b) in ranges:
            if not any(a <= e and b >= s for (s, e) in covered):
                for obj, _, _ in file_objs.get(f, []):
                    seeds.add((obj, ""))

    # ---- propagate to fixpoint across all units --------------------
    def body_refs_unit(body, obj, member, same_obj):
        if member == "":
            if re.search(rf"\b{obj}\s*[.(]", body):
                return True
            for alias in sql_alias.get(obj, []):
                if re.search(rf"\b{alias}\s*\(", body):
                    return True
            return False
        if re.search(rf"\b{obj}\.{member}\b", body):
            return True
        if same_obj and re.search(rf"\b{member}\b", body):
            return True
        return False

    affected = set(seeds)
    while True:
        grew = False
        for obj, (mem, _, _) in obj_members.items():
            for mn, body in mem.items():
                if (obj, mn) in affected or mn == "":
                    continue
                for (ao, am) in affected:
                    if body_refs_unit(body, ao, am, same_obj=(ao == obj)):
                        affected.add((obj, mn))
                        grew = True
                        break
        if not grew:
            break

    # registration-list members (e.g. `specs`) reference every query
    # val; when seeded directly by the diff, include only the query
    # vals named on CHANGED lines, not the whole catalog.
    q_mem = obj_members.get("Queries", ({}, 0, []))[0]
    for (obj, mn) in list(affected):
        if obj != "Queries" or mn == "":
            continue
        refs = set(re.findall(r"\bq[A-Z]\w*\b", q_mem.get(mn, "")))
        if len(refs) > 50:
            affected.discard((obj, mn))
            if (obj, mn) in seeds:
                ref2 = base if base else "HEAD"
                diff = git(["diff", "-U0", ref2, "--", QUERIES_PATH])
                for ln in diff.split("\n"):
                    if ln.startswith(("+", "-")) and \
                            not ln.startswith(("+++", "---")):
                        for n in re.findall(r"\bq[A-Z]\w*\b", ln):
                            if n in q_mem:
                                affected.add(("Queries", n))

    # whole-object seeds/affecteds expand to all their members
    for (obj, mn) in list(affected):
        if mn == "" and obj in obj_members:
            for m2 in obj_members[obj][0]:
                if m2:
                    affected.add((obj, m2))

    # one more propagation pass so freshly-expanded members fan out
    while True:
        grew = False
        for obj, (mem, _, _) in obj_members.items():
            for mn, body in mem.items():
                if (obj, mn) in affected or mn == "":
                    continue
                for (ao, am) in affected:
                    if body_refs_unit(body, ao, am, same_obj=(ao == obj)):
                        affected.add((obj, mn))
                        grew = True
                        break
        if not grew:
            break

    # ---- map affected Queries members to catalog names -------------
    affected_queries = set()
    for mn, body in q_mem.items():
        if ("Queries", mn) in affected:
            m = re.search(r'"(q_[a-z0-9_]+)"', body)
            if m:
                affected_queries.add(m.group(1))
    n_qmem = sum(1 for (o, _) in affected if o == "Queries")
    return affected_queries, (
        f"{len(relevant)} changed files -> {len(affected)} affected "
        f"units -> {n_qmem} Queries members")


def array_cols(df: pd.DataFrame) -> list:
    """Columns holding list/array/struct cells. The DRIVER's comparator
    does NOT stringify these — pandas sort_values dies on unhashable
    numpy.ndarray before any value compare (CORRECTNESS_r08: six err
    rows). This mirror must fail exactly where the driver fails, so
    any non-scalar result column is a hard FAIL here, never silently
    canonicalized (the r8 lesson: a lenient local gate let six
    array-output queries ship "green").
    """
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            probe = df[c].dropna().head(5)
            if any(hasattr(v, "__len__") and not isinstance(v, (str, bytes))
                   for v in probe):
                bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes BEFORE sorting: timestamps -> iso str, floats ->
    # repr. Array/struct cells never reach here — array_cols() fails
    # the query first, matching the driver's crash.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def plan_diff(affected):
    """Plan-fingerprint diff for the affected set (r11 stretch):
    when both the committed PLANS.json and a freshly generated
    PLANS_new.json exist (see graft.tools.PlanFingerprint's workflow
    doc), print per-query field changes so a silent plan regression
    (broadcast -> sort-merge, a new shuffle) surfaces beside the
    value gate. Informational only — intentional changes are
    accepted by moving PLANS_new.json over PLANS.json and committing.
    """
    prior_p = os.path.join(REPO, "PLANS.json")
    new_p = os.path.join(REPO, "PLANS_new.json")
    if not (os.path.exists(prior_p) and os.path.exists(new_p)):
        return
    with open(prior_p) as f:
        prior = json.load(f)
    with open(new_p) as f:
        new = json.load(f)
    names = sorted(affected) if affected is not None \
        else sorted(set(prior) | set(new))
    n = 0
    for name in names:
        p, c = prior.get(name), new.get(name)
        if p is not None and c is not None and p != c:
            fields = {k: (p[k], c[k]) for k in p if p.get(k) != c.get(k)}
            print(f"PLAN CHANGED {name}: " + ", ".join(
                f"{k} {a}->{b}" for k, (a, b) in sorted(fields.items())))
            n += 1
        elif p is None and c is not None:
            print(f"PLAN NEW {name}")
    print(f"plan-diff: {n} changed (PLANS.json vs PLANS_new.json)")


def main(sf_dir: str, out_dir: str, changed_only=None) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_bad = 0
    n_skipped_unchanged = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if changed_only is not None:
        n_skipped_unchanged = len([n for n in set(oracles) | set(names)
                                   if n not in changed_only])
        missing_dumps = sorted(n for n in changed_only if n not in names)
        if missing_dumps:
            print("HINT affected queries lacking dumps — run:\n  "
                  "SPARK_GRAFT_ONLY=" + ",".join(sorted(changed_only)) +
                  " sbt -batch 'runMain graft.Verify "
                  f"{sf_dir} {out_dir}'")
            for name in missing_dumps:
                print(f"FAIL {name}: affected by the diff but NO dump")
                n_bad += 1
        names = [n for n in names if n in changed_only]
    else:
        # A registered oracle whose dump is ABSENT means graft.Verify
        # errored on that query ("[verify] <name> failed: ..." on
        # stderr) — silently skipping it once hid a broken query
        # behind "ALL OK". Only flag on FULL runs: a
        # SPARK_GRAFT_ONLY-filtered Verify legitimately dumps a subset
        # (detected here as >20% absent).
        absent = sorted(set(oracles) - set(names))
        if absent and len(absent) <= max(1, len(oracles) // 5):
            for name in absent:
                print(f"FAIL {name}: registered oracle but NO dump "
                      f"(graft.Verify errored — check its stderr)")
                n_bad += 1
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        spark_df = pd.concat(pd.read_parquet(f) for f in sorted(files))
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        arr = sorted(set(array_cols(spark_df)) | set(array_cols(duck_df)))
        if arr:
            print(f"FAIL {name}: array-typed result column(s) {arr} — "
                  f"the driver comparator crashes on these; reshape to "
                  f"scalar (explode or array_join)")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1
            continue
        # Driver hashes value REPRS: int64 7 vs float64 7.0 mismatch
        # (DuckDB SUM(BIGINT)->HUGEINT->float64 is the classic cause).
        kind_bad = [c for c in a.columns
                    if a[c].dtype.kind != b[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch {[(c, str(a[c].dtype), str(b[c].dtype)) for c in kind_bad]}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(a)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e).splitlines()[-1]}")
            diff = (a != b) & ~(a.isna() & b.isna())
            rows = diff.any(axis=1)
            print(a[rows].head(3))
            print(b[rows].head(3))
            n_bad += 1
    if changed_only is not None:
        print(f"changed-mode: {len(changed_only)} affected, "
              f"{n_skipped_unchanged} skipped-unchanged")
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    changed = None
    if "--changed" in argv:
        argv.remove("--changed")
        base = None
        if "--base" in argv:
            i = argv.index("--base")
            base = argv[i + 1]
            del argv[i:i + 2]
        affected, reason = resolve_changed_queries(base)
        if affected is None:
            print(f"changed-mode: FULL RUN ({reason})")
        else:
            print(f"changed-mode: {reason}")
            print("affected: " + (",".join(sorted(affected)) or "(none)"))
            changed = affected
        plan_diff(changed)
    sys.exit(main(argv[0], argv[1], changed))
