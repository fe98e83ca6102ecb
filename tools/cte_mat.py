"""Shared-CTE materialization for the DuckDB oracle gate (VERDICT r17 #6).

The heavy oracle replays (the Lloyd fit chain, the shingle/minhash
stages, the retail pipeline replay) are byte-identical WITH prefixes
shared by many queries, and DuckDB recomputes them per query — at the
sf1 gate that recomputation IS the wall (~60 min). This module parses
each oracle's top-level WITH chain, finds the longest prefix of
(name, body) pairs shared byte-identically (modulo per-CTE strip) by
>= 2 queries, materializes each shared prefix CTE ONCE as a DuckDB
temp table, and rewrites the participating queries to read the temp
tables (`name AS (SELECT * FROM mat_<hash>)`).

Guard rails:
 - queries whose SQL is not a plain top-level WITH (or uses RECURSIVE)
   are left untouched;
 - a failed materialization marks its prefix dead and the queries fall
   back to their inline form — never a lost query;
 - `selfcheck` mode evaluates BOTH forms and the caller compares them
   exactly (run at sf0.01 before any sf1 run trusts the rewrite).
"""
import hashlib
import re


def split_ctes(sql):
    """Parse a top-level `WITH a AS (...), b AS (...) <remainder>`.

    Returns (ctes, remainder) where ctes is a list of
    (name, materialized_flag, body) — or None if the SQL is not a
    plain WITH chain this rewriter understands (no WITH, RECURSIVE,
    or anything it cannot parse losslessly).
    """
    s = sql.strip()
    m = re.match(r"(?is)^WITH\s+", s)
    if not m or re.match(r"(?is)^WITH\s+RECURSIVE\b", s):
        return None
    i = m.end()
    ctes = []
    while True:
        h = re.match(
            r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(MATERIALIZED\s+)?\(",
            s[i:], re.I | re.S)
        if not h:
            return None
        name, is_mat = h.group(1), bool(h.group(2))
        j = i + h.end()
        depth, k = 1, j
        n = len(s)
        while depth > 0:
            if k >= n:
                return None  # unbalanced — refuse to rewrite
            c = s[k]
            if c == "'":
                k += 1
                while k < n:
                    if s[k] == "'":
                        if k + 1 < n and s[k + 1] == "'":
                            k += 2  # escaped quote
                            continue
                        break
                    k += 1
                if k >= n:
                    return None
            elif c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            k += 1
        ctes.append((name, is_mat, s[j:k - 1].strip()))
        t = re.match(r"\s*,", s[k:])
        if t:
            i = k + t.end()
        else:
            return ctes, s[k:].strip()


def _key(chain):
    h = hashlib.md5()
    for name, body in chain:
        h.update(name.encode())
        h.update(b"\x00")
        h.update(body.encode())
        h.update(b"\x01")
    return h.hexdigest()[:16]


def plan(oracle):
    """Compute the materialization plan over {query: sql}.

    Returns (mats, rewrites):
      mats: ordered list of (table, chain) to materialize — chain is
            the [(name, body), ...] prefix ending at the CTE this
            table holds;
      rewrites: {query: (parsed, depth)} — rewrite the first `depth`
            CTEs of `parsed` to read mat tables.
    """
    parsed = {}
    for q, sql in oracle.items():
        p = split_ctes(sql)
        if p:
            parsed[q] = p
    counts = {}
    for q, (ctes, _) in parsed.items():
        chain = []
        for name, _m, body in ctes:
            chain.append((name, body))
            counts[_key(chain)] = counts.get(_key(chain), 0) + 1
    mats, seen, rewrites = [], set(), {}
    for q, (ctes, rem) in parsed.items():
        chain, depth = [], 0
        for idx, (name, _m, body) in enumerate(ctes):
            chain.append((name, body))
            if counts[_key(chain)] >= 2:
                depth = idx + 1
            else:
                break
        if depth == 0:
            continue
        rewrites[q] = (ctes, rem, depth)
        chain = []
        for idx in range(depth):
            chain.append((ctes[idx][0], ctes[idx][2]))
            k = _key(chain)
            if k not in seen:
                seen.add(k)
                mats.append((f"mat_{k}", list(chain)))
    return mats, rewrites


def mat_sql(table, chain):
    """CREATE TEMP TABLE statement for the LAST CTE of `chain`, with
    every earlier chain CTE read from its own (already created) mat
    table."""
    heads = []
    prefix = []
    for name, body in chain[:-1]:
        prefix.append((name, body))
        heads.append(f"{name} AS (SELECT * FROM mat_{_key(prefix)})")
    last_name, last_body = chain[-1]
    heads.append(f"{last_name} AS ({last_body})")
    return (f"CREATE TEMP TABLE {table} AS WITH " + ", ".join(heads) +
            f" SELECT * FROM {last_name}")


def rewritten_sql(ctes, remainder, depth, alive):
    """The query with its first `depth` CTEs redirected to mat tables.
    Returns None if any needed mat table is not alive (failed build)."""
    heads, chain = [], []
    for idx, (name, is_mat, body) in enumerate(ctes):
        if idx < depth:
            chain.append((name, body))
            t = f"mat_{_key(chain)}"
            if t not in alive:
                return None
            heads.append(f"{name} AS (SELECT * FROM {t})")
        else:
            mk = "MATERIALIZED " if is_mat else ""
            heads.append(f"{name} AS {mk}({body})")
    return "WITH " + ",\n".join(heads) + "\n" + remainder
