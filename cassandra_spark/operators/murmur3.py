"""Bit-exact Cassandra Murmur3 tokens (`[C* dht/Murmur3Partitioner ::
getToken; utils/MurmurHash :: hash3_x64_128, unverified]`).

Cassandra's partitioner is MurmurHash3 x64 128-bit with TWO deviations from
the canonical C++ reference, both replicated here because they are
bit-visible in every token a real driver computes:

1. **Signed tail bytes.** The Java implementation assembles the <16-byte
   tail with plain ``(long) byte`` casts — bytes >= 0x80 sign-extend before
   the shift, corrupting higher lanes exactly as the JVM does. (The 16-byte
   body blocks ARE masked ``& 0xff``, canonical little-endian.)
2. **Token normalization.** ``token = h1`` (the first 64-bit half), with
   ``Long.MIN_VALUE`` mapped to ``Long.MAX_VALUE`` so the ring never
   contains the one unpairable value.

Partition-key serialization follows the reference's type system: a bigint
partition key hashes its 8-byte big-endian two's-complement form
(`[C* db/marshal/LongType, unverified]`), text keys their UTF-8 bytes.

Three independent implementations, differential-tested in
tests/test_murmur3.py and — via the driver's oracle gate — at every round:

- :func:`murmur3_token` — pure-Python reference over arbitrary ``bytes``;
- :func:`tokens_of_bigints` — numpy-vectorized fast path for int64 keys
  (wrapping uint64 arithmetic), wrapped as an Arrow-batched pandas_udf by
  :func:`bigint_token_udf` — the engine-side ring primitive. A hash over a
  serialized key is inherently opaque to Catalyst, so the vectorized UDF
  *is* the idiomatic Spark shape here (same contract as the Spark
  connector's own partitioner bridge);
- :func:`duckdb_token_sql` — a generated DuckDB SQL expression chain
  (HUGEINT modular arithmetic + lateral column aliases) used by the p5/t3
  oracles, so the driver's value-hash compare proves Spark's numpy path and
  an independent SQL formulation agree bit-for-bit on every key in the
  test corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

C1 = 0x87C37B91114253D5
C2 = 0x4CF5AD432745937F
_M = (1 << 64) - 1  # uint64 mask
MIN64 = -(1 << 63)
MAX64 = (1 << 63) - 1


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def _signed_byte(b: int) -> int:
    """Java ``(long) byte``: sign-extended, as a uint64 bit pattern."""
    return (b - 256) & _M if b >= 0x80 else b


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Cassandra-variant MurmurHash3 x64 128; returns (h1, h2) as uint64."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = seed & _M

    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M

    # Tail: Java semantics — bytes sign-extend before shifting (deviation 1).
    tail = data[nblocks * 16 :]
    t = len(tail)
    k1 = k2 = 0
    for i in range(min(t, 15) - 1, 7, -1):  # bytes 8..14 -> k2
        k1_shift = 8 * (i - 8)
        k2 ^= (_signed_byte(tail[i]) << k1_shift) & _M
    if t > 8:
        k2 = (k2 * C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * C1) & _M
        h2 ^= k2
    for i in range(min(t, 8) - 1, -1, -1):  # bytes 0..7 -> k1
        k1 ^= (_signed_byte(tail[i]) << (8 * i)) & _M
    if t > 0:
        k1 = (k1 * C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * C2) & _M
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def murmur3_token(data: bytes) -> int:
    """Partition token of a serialized key: signed h1, MIN -> MAX
    (deviation 2)."""
    tok = _to_signed(murmur3_x64_128(data)[0])
    return MAX64 if tok == MIN64 else tok


def token_of_bigint(v: int) -> int:
    """Token of a bigint partition key (8-byte big-endian serialization)."""
    return murmur3_token(int(v).to_bytes(8, "big", signed=True))


def token_of_text(s: str) -> int:
    """Token of a text partition key (UTF-8 serialization)."""
    return murmur3_token(s.encode("utf-8"))


# ---------------------------------------------------------------------------
# Vectorized engine path: numpy wrapping-uint64 arithmetic over int64 keys.
# ---------------------------------------------------------------------------

_U = np.uint64


def _np_rotl(v: np.ndarray, r: int) -> np.ndarray:
    return (v << _U(r)) | (v >> _U(64 - r))


def _np_fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U(33))
    k = k * _U(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U(33))
    k = k * _U(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> _U(33))
    return k


def tokens_of_byte_matrix(mat: np.ndarray) -> np.ndarray:
    """Murmur3 tokens of N same-length keys, fully vectorized: ``mat`` is
    (n, L) uint8 — body blocks (masked little-endian) and the signed tail,
    any L. The building block of the length-grouped text-key path."""
    n, L = mat.shape
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    nblocks = L // 16
    for i in range(nblocks):
        blk = mat[:, i * 16 : i * 16 + 16].astype(np.uint64)
        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        for j in range(8):
            k1 = k1 | (blk[:, j] << _U(8 * j))
            k2 = k2 | (blk[:, 8 + j] << _U(8 * j))
        k1 = _np_rotl(k1 * _U(C1), 31) * _U(C2)
        h1 = h1 ^ k1
        h1 = _np_rotl(h1, 27) + h2
        h1 = h1 * _U(5) + _U(0x52DCE729)
        k2 = _np_rotl(k2 * _U(C2), 33) * _U(C1)
        h2 = h2 ^ k2
        h2 = _np_rotl(h2, 31) + h1
        h2 = h2 * _U(5) + _U(0x38495AB5)
    t = L - nblocks * 16
    if t > 0:
        tail = mat[:, nblocks * 16 :]

        def signed_lane(col: np.ndarray, shift: int) -> np.ndarray:
            sb = col.astype(np.int64)
            sb = np.where(sb >= 128, sb - 256, sb).view(np.uint64)
            return sb << _U(shift)

        if t > 8:
            k2 = np.zeros(n, dtype=np.uint64)
            for j in range(8, t):
                k2 = k2 ^ signed_lane(tail[:, j], 8 * (j - 8))
            h2 = h2 ^ (_np_rotl(k2 * _U(C2), 33) * _U(C1))
        k1 = np.zeros(n, dtype=np.uint64)
        for j in range(min(t, 8)):
            k1 = k1 ^ signed_lane(tail[:, j], 8 * j)
        h1 = h1 ^ (_np_rotl(k1 * _U(C1), 31) * _U(C2))
    h1 = h1 ^ _U(L)
    h2 = h2 ^ _U(L)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _np_fmix(h1)
    h2 = _np_fmix(h2)
    h1 = h1 + h2
    tok = h1.view(np.int64)
    return np.where(tok == np.int64(MIN64), np.int64(MAX64), tok)


def tokens_of_texts(values: list) -> np.ndarray:
    """Murmur3 tokens of text keys (UTF-8 serialization), vectorized by
    LENGTH GROUP: keys of equal byte length form one (n, L) uint8 matrix
    hashed in SIMD passes — the production path for text-keyed rings
    (per-key Python only at group-assembly time, never in the hash)."""
    encoded = [v.encode("utf-8") for v in values]
    out = np.empty(len(encoded), dtype=np.int64)
    by_len: dict[int, list[int]] = {}
    for i, b in enumerate(encoded):
        by_len.setdefault(len(b), []).append(i)
    for L, idxs in by_len.items():
        if L == 0:
            for i in idxs:
                out[i] = murmur3_token(b"")
            continue
        mat = np.frombuffer(
            b"".join(encoded[i] for i in idxs), dtype=np.uint8
        ).reshape(len(idxs), L)
        out[np.array(idxs)] = tokens_of_byte_matrix(mat)
    return out


def tokens_of_bigints(values: np.ndarray) -> np.ndarray:
    """Murmur3 tokens of an int64 array, fully vectorized. An 8-byte key
    has no body blocks — only the signed-byte tail (case 8..1) and the
    finalizer, ~30 SIMD passes over the batch."""
    u = values.astype(np.int64).view(np.uint64)
    k1 = np.zeros_like(u)
    for i in range(8):
        b = (u >> _U(8 * (7 - i))) & _U(0xFF)  # big-endian byte i
        sb = b.view(np.int64)
        sb = np.where(sb >= 128, sb - 256, sb).view(np.uint64)  # sign-extend
        k1 = k1 ^ (sb << _U(8 * i))
    k1 = k1 * _U(C1)
    k1 = _np_rotl(k1, 31)
    k1 = k1 * _U(C2)
    h1 = k1  # h1 was 0
    h1 = h1 ^ _U(8)
    h2 = np.full_like(u, _U(8))  # h2 was 0, ^= len
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _np_fmix(h1)
    h2 = _np_fmix(h2)
    h1 = h1 + h2
    tok = h1.view(np.int64)
    return np.where(tok == np.int64(MIN64), np.int64(MAX64), tok)


def bigint_token_udf():
    """Arrow-batched pandas_udf: bigint partition key -> Murmur3 token."""

    @F.pandas_udf(LongType())
    def _tok(keys: pd.Series) -> pd.Series:
        out = tokens_of_bigints(keys.to_numpy(dtype=np.int64))
        return pd.Series(out)

    return _tok


def token_col(col):
    """``token(bigint_key)`` as a Column — the ring convention used by
    p5 / the Thrift range-slice tier."""
    return bigint_token_udf()(col)


def ensure_token_registered(spark) -> None:
    """Register ``cassandra_token(key)`` as a session SQL function (the
    CQL front-end's ``token()`` target). Dispatches on the Arrow batch
    dtype per the reference's type system: int64 keys hash 8 big-endian
    bytes (LongType), int32/int16/int8 keys 4/2/1 bytes (Int32Type /
    ShortType / ByteType serializations — the same numeric value
    tokenizes differently per declared width), text keys their UTF-8
    bytes. Memoized per session object."""
    if getattr(spark, "_cassandra_token_registered", False):
        return

    def _int_tokens(arr_dtype, np_vals: np.ndarray) -> np.ndarray:
        width = arr_dtype.itemsize
        if width == 8:
            return tokens_of_bigints(np_vals.astype(np.int64))
        if width == 4:
            return tokens_of_int32s(np_vals.astype(np.int64))
        # 1/2-byte keys: big-endian fixed-width byte matrix
        w = max(1, width)
        u = np_vals.astype(np.int64) & ((1 << (8 * w)) - 1)
        mat = np.empty((len(u), w), dtype=np.uint8)
        for i in range(w):
            mat[:, i] = (u >> (8 * (w - 1 - i))) & 0xFF
        return tokens_of_byte_matrix(mat)

    @F.pandas_udf(LongType())
    def cassandra_token(keys: pd.Series) -> pd.Series:
        if pd.api.types.is_integer_dtype(keys.dtype) and not keys.isna().any():
            npv = keys.to_numpy()
            return pd.Series(_int_tokens(npv.dtype, npv))
        mask = keys.notna().to_numpy()
        result = pd.array([None] * len(keys), dtype="Int64")
        if mask.any():
            vals = keys[mask]
            npv = vals.to_numpy()
            if pd.api.types.is_integer_dtype(npv.dtype):
                toks = _int_tokens(npv.dtype, npv)
            elif pd.api.types.is_float_dtype(npv.dtype):
                # Arrow int-with-NULLs arrives as float64, losing the
                # declared width — hash the 8-byte bigint form. (A real
                # partition key is never NULL, so this leg only serves
                # token() over nullable NON-key integer columns; pinned
                # widening, never the text path.) Non-integral values
                # raise LOUDLY: silently choosing a serialization per
                # batch would make tokens batch-layout-dependent.
                if not np.all(npv == np.floor(npv)):
                    raise ValueError(
                        "token() over non-integral floating values is "
                        "not supported (no stable serialization); cast "
                        "the key to a declared integer/text type"
                    )
                toks = _int_tokens(np.dtype(np.int64), npv.astype(np.int64))
            elif isinstance(vals.iloc[0], (int, np.integer)):
                toks = _int_tokens(
                    np.dtype(np.int64),
                    np.array([int(v) for v in vals], dtype=np.int64),
                )
            else:
                # length-grouped SIMD text path (tokens_of_texts)
                toks = tokens_of_texts([str(v) for v in vals])
            result[mask] = toks
        return pd.Series(result, dtype="Int64")

    spark.udf.register("cassandra_token", cassandra_token)
    spark._cassandra_token_registered = True


# ---------------------------------------------------------------------------
# Oracle path: the same hash generated as DuckDB SQL. All arithmetic is
# HUGEINT mod 2^64; xor() is native on HUGEINT. Each hash step is its own
# nested-subquery projection level — DuckDB INLINES lateral column aliases,
# which would blow the expression tree up exponentially (~3^n for n chained
# multiply steps; empirically a multi-minute hang), whereas subquery
# projections evaluate each step once per row. Entirely independent of the
# numpy path, so the driver's value-hash compare is a true differential test.
# ---------------------------------------------------------------------------

_P64 = 1 << 64
_P32 = 1 << 32


def _sql_mul64(a: str, c: int) -> str:
    """(a * c) mod 2^64 without overflowing HUGEINT: split ``a`` into
    32-bit halves; each partial product stays under 2^97 < 2^127."""
    lo = f"(({a}) % {_P32}) * {c}"
    hi = f"(((({a}) // {_P32}) * {c % _P32}) % {_P32}) * {_P32}"
    return f"(({lo} + {hi}) % {_P64})"


def _sql_rotl(a: str, r: int) -> str:
    """rotl64 — the two shifted halves occupy disjoint bits, so + is |."""
    return f"(((({a}) * {1 << r}) % {_P64}) + (({a}) // {1 << (64 - r)}))"


def _token_chain_steps(
    byte_exprs: list[str], len_expr: str
) -> list[tuple[str, str]]:
    """The Murmur3 tail+finalize chain over ≤15 byte lanes, as
    (alias, expr) projection steps. ``byte_exprs[i]`` must yield byte i
    (0-255) or NULL past the key length; NULL lanes contribute nothing.
    Handles both tail legs: bytes 0-7 -> k1/h1, bytes 8-14 -> k2/h2
    (applied only when len > 8), exactly the reference's fallthrough."""
    steps: list[tuple[str, str]] = [("__len", len_expr)]
    nb = len(byte_exprs)
    if nb > 15:
        raise ValueError("byte-lane chain supports keys up to 15 bytes")
    for i, be in enumerate(byte_exprs):
        steps.append((f"__b{i}", be))
    for i in range(nb):
        sb = f"(CASE WHEN __b{i} >= 128 THEN __b{i} - 256 ELSE __b{i} END)"
        lane = i if i < 8 else i - 8  # k2 lanes restart at shift 0
        steps.append(
            (
                f"__s{i}",
                f"CASE WHEN __b{i} IS NULL THEN 0 ELSE "
                f"((({sb}) + {_P64}) % {_P64}) * {1 << (8 * lane)} % {_P64} "
                f"END",
            )
        )

    def xor_tree(names: list[str]) -> str:
        while len(names) > 1:
            names = [
                f"xor({names[j]}, {names[j + 1]})"
                if j + 1 < len(names)
                else names[j]
                for j in range(0, len(names), 2)
            ]
        return names[0] if names else "0"

    steps.append(("__k1", xor_tree([f"__s{i}" for i in range(min(nb, 8))])))
    steps.append(("__k1a", _sql_mul64("__k1", C1)))
    steps.append(("__k1b", _sql_rotl("__k1a", 31)))
    steps.append(("__h1a", _sql_mul64("__k1b", C2)))  # h1 = 0 ^ mix(k1)
    if nb > 8:
        steps.append(("__k2", xor_tree([f"__s{i}" for i in range(8, nb)])))
        steps.append(("__k2a", _sql_mul64("__k2", C2)))
        steps.append(("__k2b", _sql_rotl("__k2a", 33)))
        steps.append(("__k2c", _sql_mul64("__k2b", C1)))
        steps.append(
            ("__h2a", f"CASE WHEN __len > 8 THEN __k2c ELSE 0 END")
        )
    else:
        steps.append(("__h2a", "0"))
    steps.append(("__h1b", "xor(__h1a, __len)"))  # h1 ^= len
    steps.append(("__h2b", "xor(__h2a, __len)"))  # h2 ^= len
    steps.append(("__h1c", f"(__h1b + __h2b) % {_P64}"))  # h1 += h2
    steps.append(("__h2c", f"(__h2b + __h1c) % {_P64}"))  # h2 += h1
    for tag, src in (("1", "__h1c"), ("2", "__h2c")):
        steps.append((f"__f{tag}a", f"xor({src}, {src} // {1 << 33})"))
        steps.append((f"__f{tag}b", _sql_mul64(f"__f{tag}a", 0xFF51AFD7ED558CCD)))
        steps.append((f"__f{tag}c", f"xor(__f{tag}b, __f{tag}b // {1 << 33})"))
        steps.append((f"__f{tag}d", _sql_mul64(f"__f{tag}c", 0xC4CEB9FE1A85EC53)))
        steps.append((f"__f{tag}e", f"xor(__f{tag}d, __f{tag}d // {1 << 33})"))
    steps.append(("__hf", f"(__f1e + __f2e) % {_P64}"))
    steps.append(
        ("__tok",
         f"CAST(CASE WHEN __hf >= {1 << 63} THEN __hf - {_P64} ELSE __hf END"
         " AS BIGINT)")
    )
    return steps


def _wrap_chain(
    base_sql: str, steps: list[tuple[str, str]], out: str
) -> str:
    q = base_sql
    for name, expr in steps:
        q = f"SELECT *, {expr} AS {name} FROM ({q})"
    names = ", ".join(n for n, _ in steps)
    return (
        f"SELECT * EXCLUDE ({names}), "
        f"CAST(CASE WHEN __tok = {MIN64} THEN {MAX64} ELSE __tok END"
        f" AS BIGINT) AS {out} FROM ({q})"
    )


def duckdb_token_query(base_sql: str, col: str, out: str = "token") -> str:
    """Wrap ``base_sql`` (any SELECT producing bigint column ``col``) in a
    nested-subquery chain that appends the Murmur3 token of ``col`` as
    BIGINT column ``out`` and drops the intermediates.

    CALLER CONTRACT: never filter on ``out`` directly outside this query —
    DuckDB's filter pushdown substitutes the predicate through every
    projection level (~3× expression growth per multiply step, observed as
    a multi-minute hang). Put the result behind a pushdown barrier first:

        WITH toks AS MATERIALIZED ({duckdb_token_query(...)})
        SELECT * FROM toks WHERE token BETWEEN lo AND hi
    """
    pre = [("__u", f"((CAST({col} AS HUGEINT) % {_P64}) + {_P64}) % {_P64}")]
    # 8-byte big-endian serialization of the bigint key
    bytes_ = [f"(__u // {1 << (8 * (7 - i))}) % 256" for i in range(8)]
    return _wrap_chain(
        base_sql, pre + _token_chain_steps(bytes_, "8"), out
    )


def duckdb_token_query_ascii(
    base_sql: str, col: str, out: str = "token"
) -> str:
    """Murmur3 token of an ASCII text key (≤ 15 bytes) as DuckDB SQL —
    the text serialization is the key's UTF-8 bytes, which equal
    code points only for ASCII (``ord(substr(..))`` is code-point-based);
    longer keys would need body blocks, which SQL cannot loop over. The
    caller pins a column whose values satisfy both bounds (asserted in
    tests for the fixture columns used)."""
    bytes_ = [
        f"CASE WHEN {i} < __len THEN ord(substr({col}, {i + 1}, 1)) "
        "ELSE NULL END"
        for i in range(15)
    ]
    return _wrap_chain(
        base_sql,
        _token_chain_steps(bytes_, f"octet_length(encode({col}))"),
        out,
    )


# ---------------------------------------------------------------------------
# Composite partition keys: multi-column keys serialize with CompositeType
# framing (`[C* db/marshal/CompositeType :: build, unverified]`) — per
# component: 2-byte big-endian length, component bytes, one 0x00
# end-of-component byte — and the ring token is Murmur3 over the
# concatenation. A (bigint, int) key is therefore a FIXED 18-byte buffer:
# one 16-byte body block (canonical masked little-endian lanes) plus a
# 2-byte signed tail — the first shape that exercises the body-block leg
# of the hash, which single-column bigint/short-text keys never touch.
# ---------------------------------------------------------------------------


def serialize_composite(parts: list[bytes]) -> bytes:
    """CompositeType serialization of a multi-column partition key."""
    out = bytearray()
    for p in parts:
        if len(p) > 0xFFFF:
            raise ValueError("composite component exceeds 65535 bytes")
        out += len(p).to_bytes(2, "big") + p + b"\x00"
    return bytes(out)


def token_of_composite(parts: list[bytes]) -> int:
    """Pure-Python reference: token of a composite partition key."""
    return murmur3_token(serialize_composite(parts))


def tokens_of_composite_bigint_int(
    big: np.ndarray, small: np.ndarray
) -> np.ndarray:
    """Vectorized tokens of (bigint, int) composite keys: assemble the
    (n, 18) serialized-byte matrix in numpy (no per-row Python) and run
    the same SIMD body-block + tail passes as every other key shape."""
    n = len(big)
    ub = big.astype(np.int64).view(np.uint64)
    us = small.astype(np.int32).view(np.uint32).astype(np.uint64)
    mat = np.zeros((n, 18), dtype=np.uint8)
    mat[:, 1] = 8  # component-1 length prefix (0x0008)
    for i in range(8):
        mat[:, 2 + i] = ((ub >> _U(8 * (7 - i))) & _U(0xFF)).astype(np.uint8)
    # mat[:, 10] is the 0x00 end-of-component byte
    mat[:, 12] = 4  # component-2 length prefix (0x0004)
    for i in range(4):
        mat[:, 13 + i] = ((us >> _U(8 * (3 - i))) & _U(0xFF)).astype(np.uint8)
    # mat[:, 17] is the trailing 0x00
    return tokens_of_byte_matrix(mat)


def ensure_blob_token_registered(spark) -> None:
    """Register ``cassandra_token_blob(binary) -> bigint``: the Murmur3
    ring token of an already-serialized partition key. This is the
    session FE's general composite-key path — the CompositeType framing
    is assembled in Spark SQL from the typed key columns (see
    :func:`composite_token_sql`), so ONE registered UDF serves every
    composite arity/type mix. Length-grouped byte-matrix vectorization,
    same SIMD passes as the text-key path. Memoized per session."""
    if getattr(spark, "_cassandra_token_blob_registered", False):
        return

    @F.pandas_udf(LongType())
    def cassandra_token_blob(blobs: pd.Series) -> pd.Series:
        mask = blobs.notna().to_numpy()
        result = pd.array([None] * len(blobs), dtype="Int64")
        if mask.any():
            vals = [bytes(b) for b in blobs[mask]]
            toks = np.empty(len(vals), dtype=np.int64)
            by_len: dict[int, list[int]] = {}
            for i, b in enumerate(vals):
                by_len.setdefault(len(b), []).append(i)
            for L, idxs in by_len.items():
                if L == 0:
                    for i in idxs:
                        toks[i] = murmur3_token(b"")
                    continue
                mat = np.frombuffer(
                    b"".join(vals[i] for i in idxs), dtype=np.uint8
                ).reshape(len(idxs), L)
                toks[np.array(idxs)] = tokens_of_byte_matrix(mat)
            result[mask] = toks
        return pd.Series(result, dtype="Int64")

    spark.udf.register("cassandra_token_blob", cassandra_token_blob)
    spark._cassandra_token_blob_registered = True


# fixed-width integer key serializations the SQL framing below supports:
# spark type -> byte width (big-endian two's complement, the reference's
# LongType/Int32Type/ShortType/ByteType serializations)
_INT_KEY_WIDTHS = {"bigint": 8, "long": 8, "int": 4, "smallint": 2,
                   "tinyint": 1}


def composite_token_sql(components: list[tuple[str, str]]) -> str:
    """Spark-SQL expression computing the ring token of a COMPOSITE
    partition key: CompositeType framing (2-byte BE length + component
    bytes + 0x00 per component, `[C* db/marshal/CompositeType :: build,
    unverified]`) assembled with built-in binary functions, hashed by the
    registered ``cassandra_token_blob`` UDF. ``components`` is
    ``[(sql_expr, spark_type), ...]`` over the TYPED key columns; integer
    widths serialize as big-endian two's complement via hex()'s 16-digit
    bigint form, text as UTF-8 bytes with a computed length prefix."""
    parts = []
    for expr, typ in components:
        t = typ.strip().lower()
        if t in _INT_KEY_WIDTHS:
            w = _INT_KEY_WIDTHS[t]
            # low w bytes of the 8-byte BE two's-complement form
            body = (
                f"unhex(substr(lpad(hex(cast(({expr}) as bigint)), 16, '0'),"
                f" {17 - 2 * w}, {2 * w}))"
            )
            parts.append(f"X'{w:04x}'")
            parts.append(body)
        elif t == "string":
            body = f"cast(({expr}) as binary)"
            # Spark's lpad TRUNCATES strings longer than the pad width: a
            # text component over 65535 bytes would silently frame a
            # wrong length prefix (wrong token). Fail loudly instead —
            # the reference's 64KB key bound (`[C* db/marshal/
            # CompositeType — unsigned short length, unverified]`).
            guarded = (
                f"if(length({body}) > 65535, "
                f"raise_error('composite partition-key text component "
                f"exceeds the 64KB CompositeType bound'), "
                f"hex(length({body})))"
            )
            parts.append(f"unhex(lpad({guarded}, 4, '0'))")
            parts.append(body)
        else:
            raise ValueError(
                f"composite partition-key token over type {typ!r} is not "
                "supported (integer widths / text components only)"
            )
        parts.append("X'00'")
    return f"cassandra_token_blob(concat({', '.join(parts)}))"


def composite_token_col(big_col, int_col):
    """``token(bigint_key, int_key)`` as a Column — the composite-ring
    convention, Arrow-batched."""

    @F.pandas_udf(LongType())
    def _tok(b: pd.Series, s: pd.Series) -> pd.Series:
        out = tokens_of_composite_bigint_int(
            b.to_numpy(dtype=np.int64), s.to_numpy(dtype=np.int64)
        )
        return pd.Series(out)

    return _tok(big_col, int_col)


def _token_chain_steps_1block(
    byte_exprs: list[str],
) -> list[tuple[str, str]]:
    """The Murmur3 chain for FIXED-length 16..31-byte keys as (alias,
    expr) projection steps: one canonical body block (lanes 0-15, masked
    little-endian) followed by the signed tail over the remainder. Every
    byte expr must be non-NULL 0-255 (fixed-length keys only)."""
    L = len(byte_exprs)
    if not 16 <= L <= 31:
        raise ValueError("1-block chain requires 16..31 byte lanes")
    steps: list[tuple[str, str]] = [
        (f"__b{i}", be) for i, be in enumerate(byte_exprs)
    ]
    # body lanes are unsigned little-endian; shifted ranges are disjoint
    # so plain + assembles the word (max sum < 2^64, well inside HUGEINT)
    steps.append(
        ("__bk1",
         "(" + " + ".join(f"__b{j} * {1 << (8 * j)}" for j in range(8)) + ")")
    )
    steps.append(
        ("__bk2",
         "(" + " + ".join(
             f"__b{8 + j} * {1 << (8 * j)}" for j in range(8)) + ")")
    )
    steps.append(("__bk1a", _sql_mul64("__bk1", C1)))
    steps.append(("__bk1b", _sql_rotl("__bk1a", 31)))
    steps.append(("__bk1c", _sql_mul64("__bk1b", C2)))  # h1 = 0 ^ k1
    steps.append(("__bh1a", _sql_rotl("__bk1c", 27)))  # h1 = rotl(h1,27)+h2(=0)
    steps.append(
        ("__bh1b", f"(({_sql_mul64('__bh1a', 5)} + {0x52DCE729}) % {_P64})")
    )
    steps.append(("__bk2a", _sql_mul64("__bk2", C2)))
    steps.append(("__bk2b", _sql_rotl("__bk2a", 33)))
    steps.append(("__bk2c", _sql_mul64("__bk2b", C1)))  # h2 = 0 ^ k2
    steps.append(("__bh2a", _sql_rotl("__bk2c", 31)))
    steps.append(("__bh2b", f"((__bh2a + __bh1b) % {_P64})"))  # h2 += h1
    steps.append(
        ("__bh2c", f"(({_sql_mul64('__bh2b', 5)} + {0x38495AB5}) % {_P64})")
    )
    # signed tail over lanes 16..L-1 (t <= 15)
    t = L - 16
    for i in range(16, L):
        sb = f"(CASE WHEN __b{i} >= 128 THEN __b{i} - 256 ELSE __b{i} END)"
        lane = (i - 16) if (i - 16) < 8 else (i - 16) - 8
        steps.append(
            (f"__s{i}",
             f"((({sb}) + {_P64}) % {_P64}) * {1 << (8 * lane)} % {_P64}")
        )

    def xor_tree(names: list[str]) -> str:
        while len(names) > 1:
            names = [
                f"xor({names[j]}, {names[j + 1]})"
                if j + 1 < len(names)
                else names[j]
                for j in range(0, len(names), 2)
            ]
        return names[0] if names else "0"

    h1, h2 = "__bh1b", "__bh2c"
    if t > 8:
        steps.append(
            ("__tk2", xor_tree([f"__s{i}" for i in range(24, L)]))
        )
        steps.append(("__tk2a", _sql_mul64("__tk2", C2)))
        steps.append(("__tk2b", _sql_rotl("__tk2a", 33)))
        steps.append(("__tk2c", _sql_mul64("__tk2b", C1)))
        steps.append(("__th2", f"xor({h2}, __tk2c)"))
        h2 = "__th2"
    if t > 0:
        steps.append(
            ("__tk1",
             xor_tree([f"__s{i}" for i in range(16, min(L, 24))]))
        )
        steps.append(("__tk1a", _sql_mul64("__tk1", C1)))
        steps.append(("__tk1b", _sql_rotl("__tk1a", 31)))
        steps.append(("__tk1c", _sql_mul64("__tk1b", C2)))
        steps.append(("__th1", f"xor({h1}, __tk1c)"))
        h1 = "__th1"
    steps.append(("__h1b", f"xor({h1}, {L})"))
    steps.append(("__h2b", f"xor({h2}, {L})"))
    steps.append(("__h1c", f"(__h1b + __h2b) % {_P64}"))
    steps.append(("__h2c", f"(__h2b + __h1c) % {_P64}"))
    for tag, src in (("1", "__h1c"), ("2", "__h2c")):
        steps.append((f"__f{tag}a", f"xor({src}, {src} // {1 << 33})"))
        steps.append(
            (f"__f{tag}b", _sql_mul64(f"__f{tag}a", 0xFF51AFD7ED558CCD))
        )
        steps.append((f"__f{tag}c", f"xor(__f{tag}b, __f{tag}b // {1 << 33})"))
        steps.append(
            (f"__f{tag}d", _sql_mul64(f"__f{tag}c", 0xC4CEB9FE1A85EC53))
        )
        steps.append((f"__f{tag}e", f"xor(__f{tag}d, __f{tag}d // {1 << 33})"))
    steps.append(("__hf", f"(__f1e + __f2e) % {_P64}"))
    steps.append(
        ("__tok",
         f"CAST(CASE WHEN __hf >= {1 << 63} THEN __hf - {_P64} ELSE __hf END"
         " AS BIGINT)")
    )
    return steps


def duckdb_token_query_composite(
    base_sql: str, big_col: str, int_col: str, out: str = "token"
) -> str:
    """Murmur3 token of a (bigint, int) composite partition key as DuckDB
    SQL — CompositeType framing assembled as 18 fixed byte lanes, hashed
    by the 1-block chain. Same caller contract as duckdb_token_query:
    never filter on ``out`` without a MATERIALIZED barrier."""
    pre = [
        ("__ub",
         f"((CAST({big_col} AS HUGEINT) % {_P64}) + {_P64}) % {_P64}"),
        ("__ui",
         f"((CAST({int_col} AS HUGEINT) % {_P32}) + {_P32}) % {_P32}"),
    ]
    lanes = ["0", "8"]
    lanes += [f"(__ub // {1 << (8 * (7 - i))}) % 256" for i in range(8)]
    lanes += ["0", "0", "4"]
    lanes += [f"(__ui // {1 << (8 * (3 - i))}) % 256" for i in range(4)]
    lanes += ["0"]
    return _wrap_chain(base_sql, pre + _token_chain_steps_1block(lanes), out)


# ---------------------------------------------------------------------------
# int (4-byte) partition keys: Int32Type serialization
# (`[C* db/marshal/Int32Type, unverified]`) — an `int`-typed partition key
# hashes its 4-byte big-endian form, NOT the 8-byte bigint form, so its
# tokens differ from the same numeric value in a bigint column.
# ---------------------------------------------------------------------------


def token_of_int32(v: int) -> int:
    """Token of an int (4-byte) partition key."""
    return murmur3_token(int(v).to_bytes(4, "big", signed=True))


def tokens_of_int32s(values: np.ndarray) -> np.ndarray:
    """Vectorized tokens of an int32 array (4-byte big-endian keys)."""
    u = values.astype(np.int32).view(np.uint32).astype(np.uint64)
    mat = np.empty((len(u), 4), dtype=np.uint8)
    for i in range(4):
        mat[:, i] = ((u >> _U(8 * (3 - i))) & _U(0xFF)).astype(np.uint8)
    return tokens_of_byte_matrix(mat)


def int32_token_udf():
    """Arrow-batched pandas_udf: int (4-byte) partition key -> token."""

    @F.pandas_udf(LongType())
    def _tok(keys: pd.Series) -> pd.Series:
        return pd.Series(tokens_of_int32s(keys.to_numpy(dtype=np.int32)))

    return _tok


def duckdb_token_query_int32(
    base_sql: str, col: str, out: str = "token"
) -> str:
    """Murmur3 token of an int (4-byte) key as DuckDB SQL — same caller
    contract as :func:`duckdb_token_query`."""
    p32 = 1 << 32
    pre = [("__u", f"((CAST({col} AS HUGEINT) % {p32}) + {p32}) % {p32}")]
    bytes_ = [f"(__u // {1 << (8 * (3 - i))}) % 256" for i in range(4)]
    return _wrap_chain(
        base_sql, pre + _token_chain_steps(bytes_, "4"), out
    )
