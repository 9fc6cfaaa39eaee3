"""Binary trace round-trip + replay parity (destor trace_phase.c:96-142:
replaying a recorded hash trace yields identical dedup stats)."""

from __future__ import annotations

import hashlib
import os

from destor_spark.sources.trace import (
    read_trace,
    replay_dedup_stats,
    write_trace,
)


def _mk_records(n: int, dup_every: int = 3):
    recs = []
    for i in range(n):
        base = i // dup_every if i % dup_every == 0 and i > 0 else i
        digest = hashlib.md5(f"chunk-{base}".encode()).digest()
        recs.append((digest, 512 + (base % 7) * 64))
    return recs


def test_trace_roundtrip(spark, tmp_path):
    d = str(tmp_path / "traces")
    os.makedirs(d)
    r1 = _mk_records(500)
    r2 = _mk_records(300, dup_every=2)
    write_trace(os.path.join(d, "a.trace"), r1)
    write_trace(os.path.join(d, "b.trace"), r2)

    df = read_trace(spark, d).toPandas()
    assert len(df) == 800
    # per-file record counts survive
    by_file = df.groupby(df["trace_file"].str.endswith("a.trace")).size()
    assert by_file[True] == 500 and by_file[False] == 300
    # fp hex round-trips the exact digest bytes
    want_first = r1[0][0].hex()
    got_a = df[df["trace_file"].str.endswith("a.trace")]
    assert want_first in set(got_a["fp"])
    assert (got_a["size"] >= 512).all()


def test_replay_stats_match_independent_computation(spark, tmp_path):
    d = str(tmp_path / "traces2")
    os.makedirs(d)
    recs = _mk_records(900, dup_every=4)
    write_trace(os.path.join(d, "t.trace"), recs)

    got = replay_dedup_stats(read_trace(spark, d)).collect()[0]

    # independent python expectation
    sizes = {}
    total_chunks = 0
    logical = 0
    for fp, size in recs:
        sizes[fp] = size
        total_chunks += 1
        logical += size
    stored = sum(sizes.values())
    assert got["unique_chunks"] == len(sizes)
    assert got["total_chunks"] == total_chunks
    assert got["logical_bytes"] == logical
    assert got["stored_bytes"] == stored
    assert got["dedup_ratio_ppm"] == round(1_000_000 * logical / stored)


def test_bad_magic_rejected(spark, tmp_path):
    import pytest

    d = str(tmp_path / "traces3")
    os.makedirs(d)
    with open(os.path.join(d, "bad.trace"), "wb") as f:
        f.write(b"NOPE!" + b"\0" * 40)
    with pytest.raises(Exception, match="bad trace magic|PythonException"):
        read_trace(spark, d).collect()


def _mk_fsl_files(n_files: int, chunks_per: int, dup_every: int = 3):
    files = []
    for fi in range(n_files):
        chunks = []
        for ci in range(chunks_per):
            base = ci // dup_every if ci % dup_every == 0 and ci > 0 else (
                fi * 1000 + ci
            )
            chunks.append(
                (hashlib.md5(f"fsl-{base}".encode()).digest(),
                 1024 + (base % 5) * 256)
            )
        files.append((f"/data/f{fi}.bin", chunks))
    return files


def test_fsl_roundtrip_variable(spark, tmp_path):
    from destor_spark.sources.trace import read_fsl_trace, write_fsl_hashfile

    d = str(tmp_path / "fsl")
    os.makedirs(d)
    files = _mk_fsl_files(3, 40)
    write_fsl_hashfile(os.path.join(d, "t.hash"), files, chunking="variable")

    df = read_fsl_trace(spark, d).toPandas()
    assert len(df) == 120
    assert set(df["file_path"]) == {f"/data/f{i}.bin" for i in range(3)}
    # every (path, fp, size) record round-trips exactly, in order
    want = [
        (p, dig.hex(), sz) for p, cs in files for dig, sz in cs
    ]
    got = list(zip(df["file_path"], df["fp"], df["size"]))
    assert got == want


def _mk_fsl_fixed_files(n_files: int, chunks_per: int, chunk_size: int,
                        tail: int):
    """Fixed-chunking files: every chunk chunk_size except a short tail
    (file_size deliberately NOT a chunk-size multiple)."""
    files = []
    for fi in range(n_files):
        chunks = [
            (hashlib.md5(f"fslx-{fi}-{ci}".encode()).digest(),
             chunk_size if ci < chunks_per - 1 else tail)
            for ci in range(chunks_per)
        ]
        files.append((f"/data/fx{fi}.bin", chunks))
    return files


def test_fsl_roundtrip_fixed(spark, tmp_path):
    """FIXED traces store no per-chunk sizes; the reader reconstructs
    them: chunk_size everywhere, except the LAST chunk of each file =
    min(chunk_size, file_size - (chunks-1)*chunk_size) — libhashfile's
    'detect if tail was on or off' rule (libhashfile.c:898-913)."""
    from destor_spark.sources.trace import read_fsl_trace, write_fsl_hashfile

    d = str(tmp_path / "fslf")
    os.makedirs(d)
    files = _mk_fsl_fixed_files(2, 25, chunk_size=8192, tail=3000)
    write_fsl_hashfile(
        os.path.join(d, "t.hash"), files, chunking="fixed",
        fixed_chunk_size=8192,
    )
    df = read_fsl_trace(spark, d).toPandas()
    assert len(df) == 50
    # non-tail chunks report chunk_size; each file's tail reports the
    # true remainder of its (non-multiple) file_size
    want_sizes = [sz for _, cs in files for _, sz in cs]
    assert list(df["size"]) == want_sizes
    assert (df.groupby("file_path")["size"].last() == 3000).all()
    assert [r for r in df["fp"]] == [d_.hex() for _, cs in files for d_, _ in cs]


def test_fsl_fixed_tail_off(spark, tmp_path):
    """A fixed trace whose file_size IS a chunk-size multiple (tail
    off): every chunk, including the last, reports chunk_size."""
    from destor_spark.sources.trace import read_fsl_trace, write_fsl_hashfile

    d = str(tmp_path / "fslf2")
    os.makedirs(d)
    files = _mk_fsl_fixed_files(1, 10, chunk_size=4096, tail=4096)
    write_fsl_hashfile(
        os.path.join(d, "t.hash"), files, chunking="fixed",
        fixed_chunk_size=4096,
    )
    df = read_fsl_trace(spark, d).toPandas()
    assert (df["size"] == 4096).all()


def test_fsl_replay_stats_parity(spark, tmp_path):
    """Replaying an FSL trace yields the same dedup stats as an
    independent per-record computation (trace_phase.c:96-142)."""
    from destor_spark.sources.trace import read_fsl_trace, write_fsl_hashfile

    d = str(tmp_path / "fslr")
    os.makedirs(d)
    files = _mk_fsl_files(4, 60, dup_every=2)
    write_fsl_hashfile(os.path.join(d, "t.hash"), files)
    got = replay_dedup_stats(read_fsl_trace(spark, d)).collect()[0]

    sizes = {}
    total, logical = 0, 0
    for _, cs in files:
        for dig, sz in cs:
            sizes[dig] = sz
            total += 1
            logical += sz
    stored = sum(sizes.values())
    assert got["unique_chunks"] == len(sizes)
    assert got["total_chunks"] == total
    assert got["logical_bytes"] == logical
    assert got["stored_bytes"] == stored
    assert got["dedup_ratio_ppm"] == round(1_000_000 * logical / stored)


def test_fsl_all_versions_roundtrip(spark, tmp_path):
    """Every libhashfile header version 1-7 round-trips: same files,
    same digests, per-version size semantics (libhashfile.c:879-931 —
    VARIABLE v1/v2 store no sizes and report 0; v3-v6 store u64; v7
    stores u32; v6+ append a cratio byte the replay skips)."""
    from destor_spark.sources.trace import read_fsl_trace, write_fsl_hashfile

    files = _mk_fsl_files(2, 15)
    want_fps = [d_.hex() for _, cs in files for d_, _ in cs]
    want_sizes = [sz for _, cs in files for _, sz in cs]
    for v in range(1, 8):
        d = str(tmp_path / f"fslv{v}")
        os.makedirs(d)
        write_fsl_hashfile(
            os.path.join(d, "t.hash"), files, chunking="variable", version=v
        )
        df = read_fsl_trace(spark, d).toPandas()
        assert len(df) == 30, f"v{v}"
        assert list(df["fp"]) == want_fps, f"v{v}"
        assert set(df["file_path"]) == {"/data/f0.bin", "/data/f1.bin"}, f"v{v}"
        if v <= 2:  # no sizes on disk: reader reports 0, like destor
            assert (df["size"] == 0).all(), f"v{v}"
        else:
            assert list(df["size"]) == want_sizes, f"v{v}"


def test_fsl_all_versions_fixed_tail(spark, tmp_path):
    """FIXED chunking applies the tail rule in every version (the rule
    is version-independent in libhashfile.c:898-913)."""
    from destor_spark.sources.trace import read_fsl_trace, write_fsl_hashfile

    files = _mk_fsl_fixed_files(1, 8, chunk_size=4096, tail=1234)
    for v in (1, 2, 4, 6, 7):
        d = str(tmp_path / f"fslfv{v}")
        os.makedirs(d)
        write_fsl_hashfile(
            os.path.join(d, "t.hash"), files, chunking="fixed",
            fixed_chunk_size=4096, version=v,
        )
        df = read_fsl_trace(spark, d).toPandas()
        assert list(df["size"]) == [4096] * 7 + [1234], f"v{v}"


def test_truncated_v3_header_raises(spark, tmp_path):
    """A v3-v7 file shorter than ITS version's header must raise, not
    silently contribute zero rows (the v1/v2-size check let it slip)."""
    import struct

    import pytest as _pytest

    from destor_spark.sources.trace import FSL_MAGIC, read_fsl_trace

    p = tmp_path / "trunc.hash"
    # valid magic + version 3, then nothing like a full 8288-B header
    p.write_bytes(struct.pack("<II", FSL_MAGIC, 3) + b"\0" * 4300)
    with _pytest.raises(Exception, match="truncated FSL v3"):
        read_fsl_trace(spark, str(p)).collect()
