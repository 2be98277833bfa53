#!/usr/bin/env python3
"""Round-15 pure-move refactor: dissolve the round-named query files
(QRound10a..QRound13) into thematic family files, regrouping each
query entry by its name prefix. Entry text is moved verbatim except
for the two block-local helper references (qualityCte/stopList/
qualityWithLabels), which are rewritten to the hoisted QDsl names.
"""
import os, re, sys

QDIR = "src/main/scala/graft/queries"
ROUND_FILES = sorted(f for f in os.listdir(QDIR) if f.startswith("QRound"))

# ---------------------------------------------------------------- scanner
def skip_string(text, i, triple, interp):
    """i points just past the opening quote(s). Return index past close."""
    n = len(text)
    while i < n:
        c = text[i]
        if triple:
            if c == '"' and text.startswith('"""', i):
                # greedy: consume extra quotes, last 3 terminate
                j = i
                while j < n and text[j] == '"':
                    j += 1
                return j  # all trailing quotes incl. terminator
            if interp and c == '$' and i + 1 < n and text[i+1] == '{':
                i = skip_code_until_close_brace(text, i + 2)
                continue
            i += 1
        else:
            if c == '\\':
                i += 2
                continue
            if c == '"':
                return i + 1
            if interp and c == '$' and i + 1 < n and text[i+1] == '{':
                i = skip_code_until_close_brace(text, i + 2)
                continue
            i += 1
    raise ValueError("unterminated string")

def skip_code_until_close_brace(text, i):
    """Scan code starting at i until the matching '}' of an
    interpolation '${'. Returns index past that brace."""
    depth = 1
    n = len(text)
    while i < n:
        c = text[i]
        if c == '{':
            depth += 1; i += 1
        elif c == '}':
            depth -= 1; i += 1
            if depth == 0:
                return i
        else:
            i = step_code(text, i)
    raise ValueError("unterminated interpolation")

def step_code(text, i):
    """Advance one token from code position i (not a brace we track
    here). Handles comments, strings, char literals."""
    c = text[i]
    n = len(text)
    if c == '/' and i + 1 < n:
        if text[i+1] == '/':
            j = text.find('\n', i)
            return n if j < 0 else j + 1
        if text[i+1] == '*':
            depth = 1
            j = i + 2
            while j < n and depth:
                if text.startswith('/*', j):
                    depth += 1; j += 2
                elif text.startswith('*/', j):
                    depth -= 1; j += 2
                else:
                    j += 1
            return j
    if c == '"':
        # interpolator? word char immediately before the quote
        interp = i > 0 and (text[i-1].isalnum() or text[i-1] == '_')
        if text.startswith('"""', i):
            return skip_string(text, i + 3, True, interp)
        return skip_string(text, i + 1, False, interp)
    if c == "'":
        # char literal 'x' or '\n'; otherwise treat as plain token
        if i + 2 < n and text[i+1] == '\\':
            j = text.find("'", i + 2)
            if 0 < j < i + 8:
                return j + 1
        if i + 2 < n and text[i+2] == "'":
            return i + 3
        return i + 1
    return i + 1

def split_entries(text, start):
    """text[start] == '(' (the Seq open paren). Return (entries,
    index past the close paren). Entries split on depth-1 commas."""
    assert text[start] == '('
    i = start + 1
    depth = 1
    n = len(text)
    pieces, piece_start = [], i
    while i < n and depth > 0:
        c = text[i]
        if c in '([{':
            depth += 1; i += 1
        elif c in ')]}':
            depth -= 1
            if depth == 0:
                pieces.append(text[piece_start:i])
                return pieces, i + 1
            i += 1
        elif c == ',' and depth == 1:
            pieces.append(text[piece_start:i])
            piece_start = i + 1
            i += 1
        else:
            i = step_code(text, i)
    raise ValueError("unbalanced Seq")

def find_code_token(text, start, token):
    """Find `token` at code level (not in string/comment) at/after start."""
    i = start
    n = len(text)
    while i < n:
        if text.startswith(token, i):
            return i
        i = step_code(text, i)
    raise ValueError(f"token {token} not found")

# ---------------------------------------------------------------- extract
VAL_RE = re.compile(r"^  val (round\w+): Seq\[\(String, Q\)\] = (Seq\(|\{)",
                    re.M)
NAME_RE = re.compile(r'"([a-z0-9_]+)"\s*->\s*Q\(')

entries = []  # (name, prefix, source_val, text)
for fname in ROUND_FILES:
    path = os.path.join(QDIR, fname)
    text = open(path).read()
    for m in VAL_RE.finditer(text):
        val_name = m.group(1)
        if m.group(2) == "Seq(":
            seq_open = m.end() - 1
        else:
            # brace block: locate the Seq( after the prelude
            seq_kw = find_code_token(text, m.end(), "Seq(")
            seq_open = seq_kw + 3
        pieces, _ = split_entries(text, seq_open)
        for p in pieces:
            nm = NAME_RE.search(p)
            if not nm:
                if p.strip():
                    sys.exit(f"{fname}/{val_name}: piece without name:\n{p[:300]}")
                continue
            name = nm.group(1)
            body = p.strip('\n')
            # hoisted-helper rewrites (the two brace blocks only)
            if val_name == "round10Q":
                body = re.sub(r"\bqualityCte\b", "qualityCteSql", body)
                body = re.sub(r"\bstopList\b", "stopListSql", body)
            elif val_name == "round12bQ":
                body = re.sub(r"\bqualityCte\b", "qualityCteD200Sql", body)
                body = re.sub(r"\bstopList\b", "stopListSql", body)
            entries.append((name, name.split("_")[0], val_name, body))

names = [e[0] for e in entries]
assert len(names) == len(set(names)), "dup names extracted"
print(f"extracted {len(entries)} entries from {len(ROUND_FILES)} files")

# ---------------------------------------------------------------- targets
HEADER = """package graft

import org.apache.spark.sql.{{Column, DataFrame, SparkSession}}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.store.VectorStore
import graft.store.VectorStore.pointsSql
import graft.QDsl._

/** {doc} — SparkEntry query family (regrouped from the round-named
  * inventory files in round 15; same query names, same bodies —
  * SparkEntry assembles the full map and the driver contract). */
private[graft] object {obj} {{
"""

NEW_FILES = [
    ("QStats", ("stat",), "statsQ",
     "Statistics & experimentation tests/estimators"),
    ("QTimeSeries", ("ts",), "tsQ",
     "Time-series decomposition, fits, and backtests"),
    ("QGraph", ("graph",), "graphQ",
     "Graph centralities and structure over the event/dup graphs"),
    ("QPrivacy", ("priv",), "privQ",
     "Privacy: differential-privacy mechanisms and k-anon audits"),
    ("QSampling", ("samp", "pipe", "feat"), "samplingQ",
     "Sampling/splits, pipeline curation ops, and feature transforms"),
    ("QTextCorpus", ("text",), "textCorpusQ",
     "Corpus-level text profiles and retrieval evaluation"),
    ("QEmbeddings", ("emb", "vec"), "embeddingsQ",
     "Embedding-space analytics and vector-column audits"),
    ("QMultimodal", ("mm",), "mmQ",
     "Multimodal (image/audio/video) column analytics"),
]
APPENDS = {
    "ev": ("QEvents", "eventsR"),
    "dedup": ("QDedup", "dedupR"),
    "ann": ("QAnn", "annR"),
    "q": ("QRelational", "relationalR"),
    "vs": ("QExperiments", "vectorStoreR"),
}
CHUNK = 12

def chunks(lst, k):
    return [lst[i:i+k] for i in range(0, len(lst), k)]

def render_vals(base, ents):
    parts = chunks(ents, CHUNK)
    out, sub_names = [], []
    for idx, part in enumerate(parts):
        sub = f"{base}{chr(ord('A')+idx)}" if len(parts) > 1 else base
        sub_names.append(sub)
        body = ",\n\n".join(p for _, _, _, p in part)
        out.append(f"  val {sub}: Seq[(String, Q)] = Seq(\n{body}\n  )\n")
    if len(parts) > 1:
        agg = " ++ ".join(sub_names)
        out.append(f"  val {base}: Seq[(String, Q)] = {agg}\n")
    return "\n".join(out)

by_prefix = {}
for e in entries:
    by_prefix.setdefault(e[1], []).append(e)

spark_entry_refs = []
covered = set()
for obj, prefixes, agg, doc in NEW_FILES:
    ents = [e for p in prefixes for e in by_prefix.get(p, [])]
    covered.update(prefixes)
    text = HEADER.format(obj=obj, doc=doc) + "\n" + \
        render_vals(agg, ents) + "}\n"
    open(os.path.join(QDIR, obj + ".scala"), "w").write(text)
    spark_entry_refs.append(f"{obj}.{agg}")
    print(f"wrote {obj}.scala: {len(ents)} entries")

for prefix, (obj, agg) in APPENDS.items():
    ents = by_prefix.get(prefix, [])
    covered.add(prefix)
    path = os.path.join(QDIR, obj + ".scala")
    text = open(path).read()
    block = ("\n  // regrouped from the round-named inventory files in"
             " round 15\n  // (pure move — same query names, same"
             " bodies)\n" + render_vals(agg, ents))
    # insert before the object's final closing brace
    last = text.rstrip()
    assert last.endswith("}")
    open(path, "w").write(last[:-1] + block + "}\n")
    spark_entry_refs.append(f"{obj}.{agg}")
    print(f"appended {len(ents)} entries to {obj}.scala as {agg}")

missing = set(by_prefix) - covered
assert not missing, f"unrouted prefixes: {missing}"

# ---------------------------------------------------------------- SparkEntry
se_path = "src/main/scala/graft/SparkEntry.scala"
se = open(se_path).read()
start = se.index("QRound10a.round10Q")
end = se.index("QRound13.round13Q") + len("QRound13.round13Q")
refs = " ++\n      ".join(spark_entry_refs)
open(se_path, "w").write(se[:start] + refs + se[end:])
print("rewrote SparkEntry defs")

for fname in ROUND_FILES:
    os.remove(os.path.join(QDIR, fname))
print(f"removed {len(ROUND_FILES)} round files")
print("total entries routed:", sum(len(v) for v in by_prefix.values()))
