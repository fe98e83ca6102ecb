"""Shared-CTE materialization for the DuckDB oracle gate (VERDICT r17 #6).

The heavy oracle replays (the Lloyd fit chain, the shingle/minhash
stages, the retail sales projection) are byte-identical WITH prefixes
shared by many queries — and by multiple method-branch SUBQUERIES
inside one query (the recall reports embed one replay per branch).
DuckDB recomputes them per reference; at the sf1 gate that
recomputation IS the wall. This module finds every WITH chain in each
oracle (the top-level one and every parenthesized `(WITH ...)`
subquery), computes the longest prefix of (name, body) pairs shared
byte-identically (modulo per-CTE strip) by >= 2 chain sites,
materializes each shared prefix CTE ONCE as a DuckDB temp table, and
rewrites the participating chains IN PLACE (each prefix CTE body span
becomes `SELECT * FROM mat_<hash>` — a pure span splice, so
MATERIALIZED markers, nesting and everything outside the spans are
untouched).

Guard rails:
 - RECURSIVE chains and anything the parser cannot read losslessly
   are left untouched;
 - an embedded chain whose CTEs reference outer-scope names fails its
   CREATE TEMP TABLE (unknown table) and falls back inline — never a
   wrong result;
 - a failed materialization marks its table dead; any query needing a
   dead table keeps its inline form;
 - `selfcheck` mode (check_oracle.py --mat=selfcheck) evaluates BOTH
   forms and the caller compares them exactly — run at sf0.01 before
   any sf1 run trusts the rewrite.
"""
import hashlib
import re

_HEAD = re.compile(
    r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(MATERIALIZED\s+)?\(", re.I | re.S)
_TOP = re.compile(r"(?is)^\s*WITH\s")
_RECURSIVE = re.compile(r"(?is)^\s*WITH\s+RECURSIVE\b")
_EMBED = re.compile(r"(?is)\(\s*WITH\s")


def _scan_paren(s, j):
    """Index just AFTER the ')' matching the '(' that precedes s[j],
    honoring single-quoted literals ('' escapes). None if unbalanced."""
    depth, k, n = 1, j, len(s)
    while depth > 0:
        if k >= n:
            return None
        c = s[k]
        if c == "'":
            k += 1
            while k < n:
                if s[k] == "'":
                    if k + 1 < n and s[k + 1] == "'":
                        k += 2
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
    return k


def _parse_chain(s, i):
    """Parse `name AS [MATERIALIZED] (...), ...` starting at s[i:]
    (just after the WITH keyword). Returns (ctes, end) where each cte
    is (name, body, body_start, body_end) and `end` is the index after
    the last CTE's close paren — or None if unparseable."""
    ctes = []
    while True:
        m = _HEAD.match(s, i)
        if not m:
            return None
        j = m.end()
        k = _scan_paren(s, j)
        if k is None:
            return None
        ctes.append((m.group(1), s[j:k - 1].strip(), j, k - 1))
        t = re.compile(r"\s*,").match(s, k)
        if t:
            i = t.end()
        else:
            return ctes, k


def _sites(sql):
    """Every WITH chain in `sql`: the top-level one (if the statement
    is a plain WITH) plus each parenthesized subquery chain."""
    sites = []
    if _TOP.match(sql) and not _RECURSIVE.match(sql):
        p = _parse_chain(sql, _TOP.match(sql).end())
        if p:
            sites.append(p[0])
    for m in _EMBED.finditer(sql):
        if re.match(r"(?is)RECURSIVE\b", sql[m.end():]):
            continue
        p = _parse_chain(sql, m.end())
        if p:
            sites.append(p[0])
    return sites


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
            the [(name, body), ...] prefix ending at the CTE the table
            holds (build in list order: each build reads the previous
            tables);
      rewrites: {query: [(ctes, depth), ...]} — per chain site,
            rewrite the first `depth` CTE bodies to read mat tables.
    """
    parsed = {q: _sites(sql) for q, sql in oracle.items()}
    counts = {}
    for sites in parsed.values():
        for ctes in sites:
            chain = []
            for name, body, _s, _e in ctes:
                chain.append((name, body))
                k = _key(chain)
                counts[k] = counts.get(k, 0) + 1
    mats, seen, rewrites = [], set(), {}
    for q, sites in parsed.items():
        q_sites = []
        for ctes in sites:
            chain, depth = [], 0
            for idx, (name, body, _s, _e) in enumerate(ctes):
                chain.append((name, body))
                if counts[_key(chain)] >= 2:
                    depth = idx + 1
                else:
                    break
            if depth == 0:
                continue
            q_sites.append((ctes, depth))
            chain = []
            for idx in range(depth):
                chain.append((ctes[idx][0], ctes[idx][1]))
                k = _key(chain)
                if k not in seen:
                    seen.add(k)
                    mats.append((f"mat_{k}", list(chain)))
        if q_sites:
            rewrites[q] = q_sites
    return mats, rewrites


def mat_sql(table, chain):
    """CREATE TEMP TABLE statement for the LAST CTE of `chain`, with
    every earlier chain CTE read from its own (already created) mat
    table."""
    heads, prefix = [], []
    for name, body in chain[:-1]:
        prefix.append((name, body))
        heads.append(f"{name} AS (SELECT * FROM mat_{_key(prefix)})")
    last_name, last_body = chain[-1]
    heads.append(f"{last_name} AS ({last_body})")
    return (f"CREATE TEMP TABLE {table} AS WITH " + ", ".join(heads) +
            f" SELECT * FROM {last_name}")


def rewritten_sql(sql, q_sites, alive):
    """Splice `SELECT * FROM mat_x` over the first `depth` CTE body
    spans of every chain site. Sites nested inside an already-replaced
    span are dropped (their text is gone). Returns None if nothing
    could be rewritten (every needed mat table dead)."""
    repls = []  # (start, end, text)
    for ctes, depth in q_sites:
        site, chain, ok = [], [], True
        for idx in range(depth):
            name, body, s, e = ctes[idx]
            chain.append((name, body))
            t = f"mat_{_key(chain)}"
            if t not in alive:
                ok = False
                break
            site.append((s, e, f"SELECT * FROM {t}"))
        if ok and site:
            repls.extend(site)
    if not repls:
        return None
    repls.sort()
    out, pos, last_end = [], 0, -1
    for s, e, text in repls:
        if s < last_end:
            continue  # nested inside a replaced span — already gone
        out.append(sql[pos:s])
        out.append(text)
        pos = e
        last_end = e
    out.append(sql[pos:])
    return "".join(out)
