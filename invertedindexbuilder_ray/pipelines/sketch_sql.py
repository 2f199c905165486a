"""DuckDB replication of the MinHash and SimHash sketch pipelines.

The sketches are PURE INTEGER math (FNV-1a token hashes, wrap-mod-2^64
multiplies, Mersenne-61 permutations), so unlike float kernels they can
be reproduced in SQL bit-for-bit: HUGEINT (int128) holds every
intermediate (largest product: x*a < 2^122), ``xor`` works on UBIGINT,
and the seeded permutation/plane constants are DATA inlined as literals.
These oracles make the last two sketch operators driver-hash-checked.

One deliberate divergence: the engine's MAX_BUCKET skew guard truncates
pathological buckets (>256 docs sharing a band); SQL does not.  At the
driver's sf=0.01 no bucket is near the cap, so the outputs are equal;
corpora that do trip the guard are covered by ``dedup.truncation_audit``
and its tests instead.

Kernel references: functions/hashing.py (FNV over zero-padded 16 bytes),
functions/sketch.py (shingle fold, permutations, band fold, simhash).
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = 1469598103934665603
FNV_PRIME = 1099511628211
M64 = 1 << 64
M61 = (1 << 61) - 1
MIX_MULT = 2685821657736338717  # sketch._SHINGLE_MIX_MULT
MIX_SHIFT_DIV = 1 << 31  # h >> 31
U64_MAX = M64 - 1


def _token_hash_ctes(keep_term: bool = False, table: str = "documents") -> str:
    """CTE chain: documents -> toks(doc_id, pos, term) -> th(doc_id, pos, h).

    ``h`` is the engine's token hash: FNV-1a folded over the token's
    bytes zero-padded to 16 positions (functions/hashing.py:term_hash /
    tokenize._span_hashes), kept as HUGEINT in [0, 2^64).  ``table``
    lets a caller substitute an augmentation CTE for the raw view."""
    steps = []
    for j in range(1, 17):
        byte = (
            f"(CASE WHEN length(term) >= {j} "
            f"THEN ord(substr(term, {j}, 1)) ELSE 0 END)"
        )
        steps.append(
            f"th{j} AS (SELECT doc_id, pos, term, "
            f"((h - (h % 256) + CAST(xor((h % 256)::BIGINT, {byte}) AS HUGEINT))"
            f" * {FNV_PRIME}) % {M64} AS h FROM th{j - 1})"
        )
    term_sel = ", term" if keep_term else ""
    return f"""
filt AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       x -> len(x) <= 15) AS toks
    FROM {table}
),
toks AS (
    SELECT doc_id, unnest(toks) AS term,
           unnest(range(1, len(toks) + 1)) AS pos
    FROM filt
),
th0 AS (SELECT doc_id, pos, term, CAST({FNV_OFFSET} AS HUGEINT) AS h FROM toks),
{", ".join(steps)},
th AS (SELECT doc_id, pos{term_sel}, h FROM th16)
"""


def _minhash_perms(num_perm: int = 64, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """EXACT replication of sketch.minhash_signatures' coefficient draw."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    return a, b


def _fold_expr(h_expr: str, sig_expr: str) -> str:
    """One FNV band-fold step: ((h ^ sig) * prime) mod 2^64, via UBIGINT xor."""
    return (
        f"(CAST(xor(CAST(({h_expr}) AS UBIGINT), CAST(({sig_expr}) AS UBIGINT)) "
        f"AS HUGEINT) * {FNV_PRIME}) % {M64}"
    )


def sql_minhash_pairs(
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    table: str = "documents",
    prelude_ctes: str = "",
    pair_where: str = "",
) -> str:
    """Full MinHash-LSH near-dup pipeline in DuckDB: shingle fold, 64
    permutations, per-band FNV fold, band-bucket pairing, signature-
    agreement verification.  Output: (doc_a, doc_b, est_jaccard, n_bands).

    ``table``/``prelude_ctes`` let the delta-dedup oracle substitute an
    augmentation CTE for the raw view; ``pair_where`` appends an extra
    final-select predicate (e.g. ``AND doc_b >= <delta offset>``)."""
    a, b = _minhash_perms(num_perm)
    perm_rows = ", ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)" for j in range(num_perm)
    )
    r = num_perm // bands
    # band fold via grouped conditional aggregation (sig j -> band j//r,
    # slot j%r): join-free — equality joins on computed keys fell back to
    # a nested loop in DuckDB (measured 10 s for 8k rows)
    fold = f"CAST({FNV_OFFSET} AS HUGEINT)"
    for k in range(r):
        fold = _fold_expr(fold, f"max(CASE WHEN s.j % {r} = {k} THEN s.sig END)")
    return f"""
WITH {prelude_ctes}{_token_hash_ctes(table=table)},
thm AS (
    -- xor-shift mix of the token hash before the shingle fold (exact
    -- replica of sketch._SHINGLE_MIX_MULT; see shingle_hashes for why)
    SELECT doc_id, pos,
           (CAST(xor(CAST(h AS UBIGINT), CAST(h // {MIX_SHIFT_DIV} AS UBIGINT))
                 AS HUGEINT) * {MIX_MULT}) % {M64} AS h
    FROM th
),
sh3 AS (
    SELECT a.doc_id,
           ((((a.h * {FNV_PRIME}) % {M64} + b.h) % {M64}) * {FNV_PRIME}
            % {M64} + c.h) % {M64} AS sh
    FROM thm a
    JOIN thm b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN thm c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
xs AS (SELECT doc_id, (sh % {M61}) AS x FROM sh3),
perms(j, a, b) AS MATERIALIZED (VALUES {perm_rows}),
pm AS (
    SELECT xs.doc_id, p.j,
           min((((xs.x * p.a) % {M64} + p.b) % {M64}) % {M61}) AS sig
    FROM xs CROSS JOIN perms p GROUP BY xs.doc_id, p.j
),
sigs AS MATERIALIZED (
    SELECT d.doc_id, p.j,
           coalesce(pm.sig, {U64_MAX}::HUGEINT) AS sig
    FROM {table} d CROSS JOIN perms p
    LEFT JOIN pm ON pm.doc_id = d.doc_id AND pm.j = p.j
),
bandh AS MATERIALIZED (
    SELECT s.doc_id, (s.j // {r}) AS band, {fold} AS h
    FROM sigs s GROUP BY s.doc_id, (s.j // {r})
),
mpairs AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS n_bands
    FROM bandh x
    JOIN bandh y ON y.band = x.band AND y.h = x.h AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
est AS (
    SELECT p.doc_a, p.doc_b, p.n_bands,
           sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) / {float(num_perm)} AS e
    FROM mpairs p
    JOIN sigs sa ON sa.doc_id = p.doc_a
    JOIN sigs sb ON sb.doc_id = p.doc_b AND sb.j = sa.j
    GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, round(e, 6) AS est_jaccard, n_bands
FROM est WHERE e >= {threshold}{pair_where}
"""


def sql_simhash_pairs(*, max_hamming: int = 3) -> str:
    """Full SimHash near-dup pipeline in DuckDB: occurrence-weighted ±1 bit
    sums, 4x16-bit band blocking, exact hamming via per-bit disagreement
    counts (no 64-bit arithmetic needed on the pair side).
    Output: (doc_a, doc_b, hamming)."""
    pow_rows = ", ".join(f"({bb}, {1 << bb}::HUGEINT)" for bb in range(64))
    return f"""
WITH {_token_hash_ctes()},
pows(b, pw) AS MATERIALIZED (VALUES {pow_rows}),
contrib AS (
    SELECT t.doc_id, p.b,
           sum(CASE WHEN (t.h // p.pw) % 2 = 1 THEN 1 ELSE -1 END) AS s
    FROM th t CROSS JOIN pows p GROUP BY t.doc_id, p.b
),
allbits AS MATERIALIZED (
    SELECT d.doc_id, p.b,
           coalesce(CASE WHEN c.s > 0 THEN 1 ELSE 0 END, 0) AS bit
    FROM documents d CROSS JOIN pows p
    LEFT JOIN contrib c ON c.doc_id = d.doc_id AND c.b = p.b
),
chunks AS (
    SELECT doc_id, (b // 16) AS band,
           sum(bit * (1 << (b % 16)))::BIGINT AS chunk
    FROM allbits GROUP BY doc_id, (b // 16)
),
cpairs AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM chunks x
    JOIN chunks y ON y.band = x.band AND y.chunk = x.chunk AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
hams AS (
    SELECT p.doc_a, p.doc_b,
           sum(CASE WHEN ba.bit != bb.bit THEN 1 ELSE 0 END)::BIGINT AS hamming
    FROM cpairs p
    JOIN allbits ba ON ba.doc_id = p.doc_a
    JOIN allbits bb ON bb.doc_id = p.doc_b AND bb.b = ba.b
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, hamming FROM hams WHERE hamming <= {max_hamming}
"""


def sql_hll_registers(*, p: int = 12) -> str:
    """HyperLogLog register table in DuckDB, bit-exact vs
    pipelines/distinct.py: same FNV token-hash stream (th), bucket =
    h // 2^(64-p), rank = leading-zero count of the low (64-p) bits + 1
    computed EXACTLY as (64-p+1) - length(bin(w)) — no float log2,
    whose 1-ulp error near powers of two would mis-rank."""
    w_div = 1 << (64 - p)
    wb1 = (64 - p) + 1
    return f"""
WITH {_token_hash_ctes()},
hw AS (SELECT h // {w_div} AS bucket, h % {w_div} AS w FROM th)
SELECT bucket::BIGINT AS bucket,
       max(CASE WHEN w = 0 THEN {wb1}
                ELSE {wb1} - length(bin(w::BIGINT)) END)::BIGINT AS maxrank
FROM hw GROUP BY 1
"""


def sql_cms_estimates() -> str:
    """Count-Min-Sketch probe estimates in DuckDB, bit-exact vs
    pipelines/heavyhitters.py: same FNV token-hash stream (th, term
    kept); registers per row i are counts grouped by the multiply-shift
    bucket ``((h * A_i + B_i) % 2^64) // 2^(64-w_bits)`` (A_i < 2^62
    keeps h*A below int128 overflow); est = least over the d rows'
    registers at the probe term's buckets; exact = the term's true
    occurrence count.  Probe set = distinct terms of the min-doc_id
    document."""
    from .heavyhitters import CMS_A, CMS_B, CMS_D, CMS_SHIFT

    div = 1 << CMS_SHIFT
    bucket_exprs = [
        f"((h * {CMS_A[i]} + {CMS_B[i]}) % {M64}) // {div}" for i in range(CMS_D)
    ]
    reg_union = "\n        UNION ALL ".join(
        f"SELECT {i} AS i, {bucket_exprs[i]} AS bucket FROM th"
        for i in range(CMS_D)
    )
    est_joins = "\n    ".join(
        f"JOIN regs r{i} ON r{i}.i = {i} AND r{i}.bucket = "
        f"((p.h * {CMS_A[i]} + {CMS_B[i]}) % {M64}) // {div}"
        for i in range(CMS_D)
    )
    least = "least(" + ", ".join(f"r{i}.cnt" for i in range(CMS_D)) + ")"
    return f"""
WITH {_token_hash_ctes(keep_term=True)},
regs AS (
    SELECT i, bucket, count(*)::BIGINT AS cnt FROM (
        {reg_union}
    ) GROUP BY 1, 2
),
probe AS (
    SELECT DISTINCT term, h FROM th
    WHERE doc_id = (SELECT min(doc_id) FROM documents)
),
exact AS (
    SELECT term, count(*)::BIGINT AS exact FROM th
    WHERE term IN (SELECT term FROM probe) GROUP BY 1
)
SELECT p.term, {least}::BIGINT AS est, e.exact
FROM probe p
{est_joins}
JOIN exact e ON e.term = p.term
"""


def _term_fold_steps(prefix: str) -> str:
    """16-step FNV-1a fold over a CTE named ``{prefix}0`` carrying
    (term, h); produces ``{prefix}16``.  Same math as _token_hash_ctes
    but source-agnostic (first 16 bytes of ``term``)."""
    steps = []
    for j in range(1, 17):
        byte = (
            f"(CASE WHEN length(term) >= {j} "
            f"THEN ord(substr(term, {j}, 1)) ELSE 0 END)"
        )
        steps.append(
            f"{prefix}{j} AS (SELECT term, "
            f"((h - (h % 256) + CAST(xor((h % 256)::BIGINT, {byte}) AS HUGEINT))"
            f" * {FNV_PRIME}) % {M64} AS h FROM {prefix}{j - 1})"
        )
    return ", ".join(steps)


def sql_bloom_probe() -> str:
    """Bloom membership verdicts in DuckDB, bit-exact vs
    pipelines/bloom.py: 2^16-bit filter as 32-bit words over the base
    split's token hashes (multiply-shift bit positions, the CMS
    constants), probed by the held-out vocabulary plus 16-byte-truncated
    synthetic negatives.  ``actually_in_base`` matches by HASH (exactly
    the engine's broadcast-probe semantics), not by string."""
    from .bloom import (
        BLOOM_HOLDOUT_EVERY,
        BLOOM_K,
        BLOOM_NEG_SUFFIX,
        BLOOM_SHIFT,
    )
    from .heavyhitters import CMS_A, CMS_B

    div = 1 << BLOOM_SHIFT
    bit_exprs = [
        f"((h * {CMS_A[i]} + {CMS_B[i]}) % {M64}) // {div}" for i in range(BLOOM_K)
    ]
    bit_union = "\n        UNION ".join(
        f"SELECT DISTINCT {e} AS bit FROM base_th" for e in bit_exprs
    )
    maybe_conds = " AND ".join(
        f"({e}) IN (SELECT bit FROM bitset)" for e in bit_exprs
    )
    return f"""
WITH {_token_hash_ctes(keep_term=True)},
base_th AS (SELECT term, h FROM th WHERE doc_id % {BLOOM_HOLDOUT_EVERY} != 0),
held_terms AS (
    SELECT DISTINCT term FROM th WHERE doc_id % {BLOOM_HOLDOUT_EVERY} = 0
),
probe_terms AS (
    SELECT term FROM held_terms
    UNION
    SELECT substr(term || '{BLOOM_NEG_SUFFIX}', 1, 16) FROM held_terms
),
p0 AS (SELECT term, CAST({FNV_OFFSET} AS HUGEINT) AS h FROM probe_terms),
{_term_fold_steps('p')},
ph AS (SELECT term, h FROM p16),
bitset AS (
    {bit_union}
),
base_h AS (SELECT DISTINCT h FROM base_th)
SELECT ph.term,
       (CASE WHEN {maybe_conds} THEN 1 ELSE 0 END)::BIGINT AS maybe_in_base,
       (CASE WHEN ph.h IN (SELECT h FROM base_h) THEN 1 ELSE 0 END)::BIGINT
           AS actually_in_base
FROM ph
"""


def sql_hll_registers_grouped(*, p: int = 12, group_col: str = "lang") -> str:
    """Per-group HLL register table (distinct.hll_token_registers_by):
    the sql_hll_registers derivation with the document's group column
    joined in before the register max."""
    w_div = 1 << (64 - p)
    wb1 = (64 - p) + 1
    return f"""
WITH {_token_hash_ctes()},
hw AS (
    SELECT d.{group_col} AS {group_col}, h // {w_div} AS bucket, h % {w_div} AS w
    FROM th JOIN documents d USING (doc_id)
)
SELECT {group_col}, bucket::BIGINT AS bucket,
       max(CASE WHEN w = 0 THEN {wb1}
                ELSE {wb1} - length(bin(w::BIGINT)) END)::BIGINT AS maxrank
FROM hw GROUP BY 1, 2
"""
