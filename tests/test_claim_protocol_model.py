"""Exhaustive interleaving model-check of the two-flag protocol.

``llm/bm25_index.py``'s safety argument (the sentinel comment at
_COMPACTING_SENTINEL) is stated in prose: an append creates its claim
THEN checks the sentinel; a compactor/rebuild creates the sentinel THEN
checks claims; for both to proceed into overlapping critical sections
the required ordering would be cyclic, which is impossible under
ordered create/stat visibility (POSIX). These tests make that argument
MECHANICAL: enumerate EVERY interleaving of the actors' atomic steps
(create/stat are atomic and totally ordered on a POSIX filesystem —
exactly the modeling assumption the docstring claims) and assert the
no-lost-append invariant in each one. Zero sampling — the state space
is small enough to sweep completely:

- 1 append + 1 compactor:      C(8;4,4)            =       70
- 2 appends + 1 compactor:     C(12;4,4,4)         =   34,650
- 1 append + compactor + rebuild: C(12;4,4,4)      =   34,650
- 3 appends + 1 compactor:     C(16;4,4,4,4)       =  ~63.1 M — NOT
  swept; 2-append coverage is complete for this protocol because
  claims never interact with each other (appends are commutative by
  construction — disjoint file groups + distinct batch_ids), so any
  violation involving k>2 appends projects onto a violating
  2-append-vs-sentinel-holder sub-interleaving.

Model (mirrors the code paths, one atomic filesystem op per step):

append i   : claim(i) → check-sentinel → write(i) → unclaim(i)
             (aborts at check-sentinel if the sentinel exists; its
             ``finally`` unclaim still runs as a later step — the
             claim is visible to the compactor until then, exactly
             like _append_guard)
sentinel-side actor (compactor / rebuild): create-sentinel (aborts if
             one exists: exclusive create) → check-claims (aborts and
             releases if any claim is visible) → READ+swap (the
             rewrite: everything not landed by this instant is lost
             from the new layout) → release-sentinel

Invariant (no silent data loss, the r12 ADVICE medium): at the moment
any sentinel-side actor executes its READ step, every append that
passed its sentinel check has already completed its write. An append
that refused (or hasn't checked yet) writes nothing until it retries
against the post-swap layout, so it cannot be lost.

Liveness is intentionally NOT asserted: mutual refusal (both actors
abort) is an accepted outcome of the loud-raise design — the bounded
wait variant (wait_for_appends_s) trades it for a drain, tested with
real threads in tests/test_bm25_index.py. The wait variant's
release-and-re-poll loop IS swept for safety here (r14 verdict #4,
r15): see WaitingCompactor below — a 2-attempt unrolling against 1
and 2 appends (495 / 900,900 interleavings), a sibling sentinel
actor (495), and the full append + waiter + sibling three-way
(900,900), with a stale-poll-observation negative control.
"""

from __future__ import annotations


from dataclasses import dataclass, field


@dataclass
class Append:
    ident: str
    # step cursor: 0=claim, 1=check-sentinel, 2=write, 3=unclaim
    pc: int = 0
    proceeded: bool | None = None  # None until check-sentinel runs

    def steps_total(self) -> int:
        return 4


@dataclass
class SentinelActor:
    """Compactor or rebuild — both take the sentinel side."""

    ident: str
    # 0=create-sentinel, 1=check-claims, 2=read+swap, 3=release
    pc: int = 0
    acquired: bool | None = None
    proceeded: bool | None = None
    read_ok: bool | None = None  # invariant evaluated at READ time

    def steps_total(self) -> int:
        return 4


@dataclass
class World:
    claims: set = field(default_factory=set)
    sentinel_holder: str | None = None
    landed: set = field(default_factory=set)


def _step_append(a: Append, w: World) -> None:
    if a.pc == 0:
        w.claims.add(a.ident)
    elif a.pc == 1:
        a.proceeded = w.sentinel_holder is None
    elif a.pc == 2:
        if a.proceeded:
            w.landed.add(a.ident)
    elif a.pc == 3:
        # _append_guard's finally: releases on success AND on refusal
        w.claims.discard(a.ident)
    a.pc += 1


def _step_sentinel_actor(c: SentinelActor, w: World, appends: list[Append]) -> None:
    if c.pc == 0:
        c.acquired = w.sentinel_holder is None  # exclusive create
        if c.acquired:
            w.sentinel_holder = c.ident
    elif c.pc == 1:
        if c.acquired:
            c.proceeded = not w.claims
            if not c.proceeded:
                w.sentinel_holder = None  # release on refusal
    elif c.pc == 2:
        if c.acquired and c.proceeded:
            # THE invariant: every append that passed its check has
            # landed by the time the rewrite reads the layout
            c.read_ok = all(
                (a.proceeded is not True) or (a.ident in w.landed)
                for a in appends
            )
    elif c.pc == 3:
        if c.acquired and c.proceeded:
            w.sentinel_holder = None
    c.pc += 1


def _multiset_permutations(counts: dict[str, int]):
    """Every distinct merge of the actors' step sequences — multiset
    permutations, generated directly (materializing 12! permutations
    and deduping would not terminate in test time)."""
    total = sum(counts.values())
    prefix: list[str] = []

    def rec():
        if len(prefix) == total:
            yield tuple(prefix)
            return
        for aid in counts:
            if counts[aid] > 0:
                counts[aid] -= 1
                prefix.append(aid)
                yield from rec()
                prefix.pop()
                counts[aid] += 1

    yield from rec()


def _sweep(n_appends: int, n_sentinel_actors: int) -> tuple[int, int]:
    """Run every interleaving; return (n_interleavings, n_reads_checked).

    Raises AssertionError inside if any interleaving violates the
    invariant (message carries the schedule for reproduction).
    """
    actor_ids = [f"a{i}" for i in range(n_appends)] + [
        f"s{i}" for i in range(n_sentinel_actors)
    ]

    n_inter = 0
    n_reads = 0
    for sched in _multiset_permutations({aid: 4 for aid in actor_ids}):
        n_inter += 1
        appends = [Append(f"a{i}") for i in range(n_appends)]
        actors = [SentinelActor(f"s{i}") for i in range(n_sentinel_actors)]
        by_id = {a.ident: a for a in appends} | {c.ident: c for c in actors}
        w = World()
        for aid in sched:
            node = by_id[aid]
            if isinstance(node, Append):
                _step_append(node, w)
            else:
                _step_sentinel_actor(node, w, appends)
        for c in actors:
            if c.read_ok is not None:
                n_reads += 1
                assert c.read_ok, (
                    f"LOST APPEND under schedule {sched}: a proceeded "
                    "append had not landed when the rewrite read the "
                    "layout"
                )
        # sanity: no interleaving leaves a sentinel held by a completed
        # actor (the release paths cover success AND refusal)
        assert w.sentinel_holder is None, sched
    return n_inter, n_reads


def test_one_append_one_compactor_every_interleaving_safe():
    n_inter, n_reads = _sweep(1, 1)
    assert n_inter == 70  # C(8;4,4) — the sweep really was exhaustive
    assert n_reads > 0  # the invariant was actually exercised


def test_two_appends_one_compactor_every_interleaving_safe():
    n_inter, n_reads = _sweep(2, 1)
    assert n_inter == 34650  # 12!/(4!4!4!)
    assert n_reads > 0


def test_append_vs_compactor_vs_rebuild_every_interleaving_safe():
    """r13 advice low #2: rebuilds take the sentinel side too, so
    rebuild-vs-append is the same two-flag argument and
    rebuild-vs-compactor is the sentinel's exclusive create — swept
    here as a second sentinel-side actor."""
    n_inter, n_reads = _sweep(1, 2)
    assert n_inter == 34650
    assert n_reads > 0


def test_model_detects_the_pre_fix_race():
    """Negative control — the sweep is not vacuous: flip the append's
    step order to check-sentinel-THEN-claim (the pre-r12 protocol,
    where the claim did not exist yet when the compactor looked) and
    the sweep must find a lost append. The witness schedule it finds
    is exactly the r12 ADVICE medium: append checks (no sentinel),
    compactor sentinels + sees no claims, append claims and writes
    after the rewrite already read the layout."""
    import pytest

    def broken_step_append(a: Append, w: World) -> None:
        if a.pc == 0:
            a.proceeded = w.sentinel_holder is None  # check FIRST (bug)
        elif a.pc == 1:
            w.claims.add(a.ident)  # claim second — too late
        elif a.pc == 2:
            if a.proceeded:
                w.landed.add(a.ident)
        elif a.pc == 3:
            w.claims.discard(a.ident)
        a.pc += 1

    global _step_append
    healthy = _step_append
    _step_append = broken_step_append
    try:
        with pytest.raises(AssertionError, match="LOST APPEND"):
            _sweep(1, 1)
    finally:
        _step_append = healthy


def _sentinel_hold_spans(sched, step_fn):
    """Replay a 2-sentinel-actor schedule; return each acquiring
    actor's half-open [acquire_step, release_step) hold span."""
    actors = {c.ident: c for c in (SentinelActor("s0"), SentinelActor("s1"))}
    w = World()
    spans: dict[str, tuple[int, int]] = {}
    opened: dict[str, int] = {}
    for i, aid in enumerate(sched):
        c = actors[aid]
        step_fn(c, w, [])
        if c.pc - 1 == 0 and c.acquired:
            opened[aid] = i
        if aid in opened and w.sentinel_holder != aid:
            spans[aid] = (opened.pop(aid), i)
    for aid, start in opened.items():  # never released (model bug)
        spans[aid] = (start, len(sched))
    return spans


def test_sentinel_exclusive_create_never_double_grants():
    """Two sentinel-side actors' HOLD SPANS are disjoint in every
    interleaving (an earlier form of this test checked a condition the
    model's acquire step makes unreachable by definition — review
    finding r14: it could never fail). Spans are computed from the
    world's holder transitions, and a sabotaged acquire that ignores
    the existing holder is shown to produce an overlap — the check has
    teeth."""
    overlaps_possible = 0
    for sched in _multiset_permutations({"s0": 4, "s1": 4}):
        spans = _sentinel_hold_spans(sched, _step_sentinel_actor)
        if len(spans) == 2:
            (a1, r1), (a2, r2) = spans["s0"], spans["s1"]
            assert r1 <= a2 or r2 <= a1, (sched, spans)
            overlaps_possible += 1
    assert overlaps_possible > 0  # both-acquire schedules were exercised

    # negative control: an acquire that skips the exclusive-create
    # check must produce overlapping spans under SOME schedule
    def broken_step(c: SentinelActor, w: World, appends) -> None:
        if c.pc == 0:
            c.acquired = True  # ignores the current holder (bug)
            w.sentinel_holder = c.ident
            c.pc += 1
            return
        _step_sentinel_actor(c, w, appends)

    found_overlap = False
    for sched in _multiset_permutations({"s0": 4, "s1": 4}):
        spans = _sentinel_hold_spans(sched, broken_step)
        if len(spans) == 2:
            (a1, r1), (a2, r2) = spans["s0"], spans["s1"]
            if not (r1 <= a2 or r2 <= a1):
                found_overlap = True
                break
    assert found_overlap, "sabotaged acquire was not detected — model too weak"


@dataclass
class WaitingCompactor:
    """The ``wait_for_appends_s`` variant's release-and-re-poll loop
    (r14 verdict #4, taken in r15), unrolled to a bounded number of
    acquire attempts — the real loop only ever repeats the same
    already-verified acquire, so a 2-attempt unrolling exercises every
    novel ordering the loop adds: the flagless poll observing a stale
    claim-free instant, the acquire racing a fresh claim, the
    release-on-refusal, and the RE-poll + RE-acquire afterwards.

    Program (8 steps, two attempts then commit):
      attempt k: poll (flagless claim observation — NO world change)
                 → create-sentinel (exclusive; a held sibling sentinel
                   is a terminal abort, as in the code)
                 → check-claims (release + fall through to the next
                   attempt on refusal — THE loop edge)
      then:      read+swap → release
    """

    ident: str
    pc: int = 0
    attempt: int = 0  # 0 or 1 while looping; 2 = out of attempts
    holding: bool = False
    proceeded: bool | None = None
    aborted: bool = False
    read_ok: bool | None = None
    # saboteur hook (negative control): when True, every attempt's
    # check step trusts that attempt's POLL observation instead of
    # re-reading the claims AFTER the sentinel create — i.e. the
    # flagless poll used as the claim check itself, the exact race the
    # code's comment names ("an append that claimed between our
    # observation and our sentinel create")
    trust_poll_observation: bool = False
    _poll_saw_clear: bool = False

    def steps_total(self) -> int:
        return 8


def _step_waiting_compactor(c: WaitingCompactor, w: World, appends) -> None:
    step = c.pc
    c.pc += 1
    if c.aborted or c.proceeded:
        # terminal abort / already committed: remaining attempt steps
        # are no-ops; READ/RELEASE below still key off `proceeded`
        if step == 6 and c.proceeded:
            c.read_ok = all(
                (a.proceeded is not True) or (a.ident in w.landed)
                for a in appends
            )
        elif step == 7 and c.proceeded:
            w.sentinel_holder = None
            c.holding = False
        return
    phase = step % 3 if step < 6 else None
    if step < 6:
        if c.attempt != step // 3:
            return  # this attempt was consumed early or not reached
        if phase == 0:  # flagless poll
            c._poll_saw_clear = not w.claims
            if not c._poll_saw_clear and w.sentinel_holder is not None:
                c.aborted = True  # claims + sibling sentinel → raise
            elif not c._poll_saw_clear:
                c.attempt += 1  # claims seen: wait, try next attempt
                if c.attempt >= 2:
                    c.aborted = True  # deadline raise
        elif phase == 1:  # exclusive sentinel create
            if w.sentinel_holder is not None:
                c.aborted = True  # FileExistsError — terminal, no retry
            else:
                w.sentinel_holder = c.ident
                c.holding = True
        elif phase == 2:  # claim check AFTER the create
            if c.trust_poll_observation:
                clear = c._poll_saw_clear  # stale observation (bug)
            else:
                clear = not w.claims
            if clear:
                c.proceeded = True
            else:
                w.sentinel_holder = None  # release and re-poll
                c.holding = False
                c.attempt += 1
                if c.attempt >= 2:
                    c.aborted = True  # deadline raise
    elif step == 6 and c.proceeded:
        c.read_ok = all(
            (a.proceeded is not True) or (a.ident in w.landed)
            for a in appends
        )
    elif step == 7 and c.proceeded:
        w.sentinel_holder = None
        c.holding = False


def _sweep_wait(n_appends: int, with_plain_compactor: bool = False,
                sabotage: bool = False) -> tuple[int, int]:
    counts = {f"a{i}": 4 for i in range(n_appends)}
    counts["w"] = 8
    if with_plain_compactor:
        counts["s"] = 4
    n_inter = 0
    n_reads = 0
    for sched in _multiset_permutations(counts):
        n_inter += 1
        appends = [Append(f"a{i}") for i in range(n_appends)]
        wait = WaitingCompactor("w", trust_poll_observation=sabotage)
        plain = SentinelActor("s") if with_plain_compactor else None
        by_id: dict = {a.ident: a for a in appends}
        w = World()
        for aid in sched:
            if aid == "w":
                _step_waiting_compactor(wait, w, appends)
            elif aid == "s":
                _step_sentinel_actor(plain, w, appends)
            else:
                _step_append(by_id[aid], w)
        checked = [wait.read_ok] + (
            [plain.read_ok] if plain is not None else []
        )
        for ok in checked:
            if ok is not None:
                n_reads += 1
                assert ok, (
                    f"LOST APPEND under schedule {sched}: a proceeded "
                    "append had not landed when the rewrite read the "
                    "layout"
                )
        assert w.sentinel_holder is None, sched
    return n_inter, n_reads


def test_wait_variant_loop_every_interleaving_safe():
    """The release-and-re-poll loop, swept exhaustively against one
    append: C(12;4,8) = 495 interleavings. The loop's novel edge —
    refusal releases the sentinel, the NEXT attempt re-acquires and
    re-checks — never lets a proceeded append be missing from the
    rewrite's read."""
    n_inter, n_reads = _sweep_wait(1)
    assert n_inter == 495  # 12!/(4!8!) — exhaustive
    assert n_reads > 0


def test_wait_variant_two_appends_every_interleaving_safe():
    """Two appends vs the looping compactor: C(16;4,4,8) = 900,900
    interleavings — the largest sweep in the file, still seconds. Two
    appends cover all claim-interaction the protocol has (appends are
    commutative by construction), and the loop adds the cross-attempt
    orderings a single-shot acquire cannot reach."""
    n_inter, n_reads = _sweep_wait(2)
    assert n_inter == 900_900
    assert n_reads > 0


def test_wait_variant_vs_plain_compactor_every_interleaving_safe():
    """The looping compactor against a plain sentinel actor (sibling
    compaction/rebuild): sentinel exclusivity must hold across the
    loop's release points, and a sibling's held sentinel is a terminal
    abort for the waiter (never a silent co-hold)."""
    n_inter, _ = _sweep_wait(0, with_plain_compactor=True)
    assert n_inter == 495  # C(12;8,4)


def test_wait_model_detects_stale_poll_observation():
    """Negative control — the loop sweep has teeth: a waiter that
    trusts its flagless POLL observation as the claim check (instead
    of re-reading the claims AFTER the sentinel create — the exact
    race the acquire's comment names: an append can claim between the
    observation and the create) must lose an append under some
    schedule. The witness is: poll sees clear → append claims and
    passes its sentinel check → waiter creates the sentinel and
    "verifies" via the stale poll → rewrite reads before the append's
    write lands."""
    import pytest

    with pytest.raises(AssertionError, match="LOST APPEND"):
        _sweep_wait(1, sabotage=True)


def test_wait_variant_vs_compactor_vs_append_every_interleaving_safe():
    """The full three-way: one append, the looping waiter, AND a plain
    sentinel-side sibling — C(16;4,8,4) = 900,900 interleavings. The
    novel orderings here are the waiter re-polling across the
    sibling's whole hold span (terminal abort, never a co-hold) and
    the sibling acquiring inside one of the waiter's released refusal
    windows; the no-lost-append invariant must hold at BOTH actors'
    read steps."""
    n_inter, n_reads = _sweep_wait(1, with_plain_compactor=True)
    assert n_inter == 900_900
    assert n_reads > 0


@dataclass
class RecoverThenCompact:
    """An OPERATOR sequence: ``recover_compaction`` (crash repair with
    the fresh-claim guard, r13 advice) followed — only if the recover
    did not raise — by a compaction. Models the r16 question: can a
    MISTAKEN recover, invoked while ingest is still live, sweep a live
    writer's claim and thereby let its compaction read a layout the
    append is still writing into?

    The freshness model maps the code's mtime threshold onto actor
    identity: a claim owned by a live Append actor is always FRESH
    (claims are held for one append's duration, far under the 60 s
    threshold), the pre-seeded crashed claim is OLD. ``force=True``
    skips the guard — the documented just-killed-the-ingest override —
    and the negative control below shows exactly the lost-append
    schedule it re-opens.

    Program (8 steps):
      0 list-claims (the glob snapshot)
      1 freshness check over the snapshot (re-stat: a claim already
        released is skipped, as the code's FileNotFoundError handler)
        → raise (halt the WHOLE sequence) if any fresh, unless force
      2 sweep: unlink every snapshot member (only reached fresh-free)
      3 release any sentinel (crash repair tail; no live maintenance
        exists in this scenario, per recover's standing contract)
      4-7 the compactor half, verbatim SentinelActor semantics
    """

    ident: str
    force: bool = False
    pc: int = 0
    snapshot: tuple = ()
    refused: bool | None = None
    acquired: bool | None = None
    proceeded: bool | None = None
    read_ok: bool | None = None

    def steps_total(self) -> int:
        return 8


def _step_recover_then_compact(
    r: RecoverThenCompact, w: World, appends: list[Append]
) -> None:
    live_idents = {a.ident for a in appends}
    if r.pc == 0:
        r.snapshot = tuple(w.claims)
    elif r.pc == 1:
        fresh = [
            c for c in r.snapshot if c in w.claims and c in live_idents
        ]
        r.refused = (not r.force) and bool(fresh)
    elif r.pc == 2:
        if not r.refused:
            for c in r.snapshot:
                w.claims.discard(c)
    elif r.pc == 3:
        if not r.refused:
            w.sentinel_holder = None  # missing_ok unlink
    elif r.pc == 4:
        if not r.refused:
            r.acquired = w.sentinel_holder is None
            if r.acquired:
                w.sentinel_holder = r.ident
    elif r.pc == 5:
        if r.acquired:
            r.proceeded = not w.claims
            if not r.proceeded:
                w.sentinel_holder = None
    elif r.pc == 6:
        if r.acquired and r.proceeded:
            r.read_ok = all(
                (a.proceeded is not True) or (a.ident in w.landed)
                for a in appends
            )
    elif r.pc == 7:
        if r.acquired and r.proceeded:
            w.sentinel_holder = None
    r.pc += 1


def _sweep_recover(n_appends: int, force: bool) -> tuple[int, int, int, int]:
    """Every interleaving of n live appends vs one recover-then-compact
    operator sequence, against a layout holding one CRASHED writer's
    claim. Returns (n_interleavings, n_reads_checked, n_refusals,
    n_crashed_sweeps); raises on any lost append."""
    counts = {f"a{i}": 4 for i in range(n_appends)} | {"r": 8}
    n_inter = n_reads = n_refused = n_swept = 0
    for sched in _multiset_permutations(counts):
        n_inter += 1
        appends = [Append(f"a{i}") for i in range(n_appends)]
        by_id = {a.ident: a for a in appends}
        r = RecoverThenCompact("r", force=force)
        w = World(claims={"crashed0"})
        for aid in sched:
            if aid == "r":
                _step_recover_then_compact(r, w, appends)
            else:
                _step_append(by_id[aid], w)
        if r.read_ok is not None:
            n_reads += 1
            assert r.read_ok, (
                f"LOST APPEND under schedule {sched}: recover swept a "
                "live claim and the compaction read mid-write"
            )
        if r.refused:
            n_refused += 1
        if "crashed0" not in w.claims:
            n_swept += 1
        assert w.sentinel_holder is None, sched
    return n_inter, n_reads, n_refused, n_swept


def test_recover_then_compact_vs_live_append_every_interleaving_safe():
    """The fresh-claim guard is what makes a mistaken mid-ingest
    recover safe: in EVERY interleaving it either refuses (a live
    claim was in its listing) or sweeps only the crashed claim — and
    the compaction that follows never reads a layout a proceeded
    append has not finished writing."""
    n_inter, n_reads, n_refused, n_swept = _sweep_recover(1, force=False)
    assert n_inter == 495  # C(12;4,8)
    assert n_reads > 0     # the compaction half actually ran somewhere
    assert n_refused > 0   # the guard actually fired somewhere
    assert n_swept > 0     # the crashed claim actually got swept somewhere


def test_recover_then_compact_vs_two_appends_every_interleaving_safe():
    """Two live writers racing the operator sequence — 900,900
    schedules (16!/(4!4!8!)), the same completeness bound as the
    two-append compactor sweep (claims never interact, so 2-append
    coverage projects any k>2 violation onto a swept schedule)."""
    n_inter, n_reads, n_refused, n_swept = _sweep_recover(2, force=False)
    assert n_inter == 900_900
    assert n_reads > 0
    assert n_refused > 0
    assert n_swept > 0


def test_recover_force_reopens_the_race_model_detects_it():
    """Negative control: ``force=True`` (the documented override for a
    just-killed ingest) skips the freshness guard — against a STILL
    LIVE append the sweep must find the lost-append schedule (recover
    unlinks the live claim, the compaction acquires over the append's
    in-flight write and reads early). This is why force's contract
    demands the ingest be stopped first."""
    import pytest

    with pytest.raises(AssertionError, match="LOST APPEND"):
        _sweep_recover(1, force=True)


# ---------------------------------------------------------------------------
# The commit-record pair gate (r16 verdict #1, fixed in r17; swept here
# per r16 "next round" #7: the flag sweeps above model the
# claim/sentinel protocol but not the RECORD-pair gate)
# ---------------------------------------------------------------------------

_PAIR_BM25 = ("postings", "stats")
_PAIR_MINHASH = ("features", "bands")


@dataclass
class RecordWorld:
    """The swap-commit state one layout directory carries, at the
    granularity the record-pair gate reads it: the record (and the pair
    its payload declares — ``None`` models the pre-r17 bare ``rebuild``
    form, which the FIXED reader maps to the bm25/chunk default pair),
    the two artifacts' staged/swapped flags, the squash-watermark
    marker, and the sentinel."""

    record_pair: tuple | None = None  # payload pair; None = bare form
    record_present: bool = False
    staged: dict = field(default_factory=lambda: {n: False for n in _PAIR_BM25})
    swapped: dict = field(default_factory=lambda: {n: False for n in _PAIR_BM25})
    marker_present: bool = True  # pre-existing append lineage
    sentinel_holder: str | None = None


@dataclass
class RecordRebuild:
    """``_run_rebuild`` on the bm25/chunk layout, one atomic filesystem
    op per step (bm25_index.py:690-737): acquire sentinel → stage both
    ``.compact`` artifacts → write the commit record → swap both →
    unlink marker → unlink record → release. ``bare_record`` writes the
    pre-r17 payload form (no pairspec) — accepted on read only; the
    sweep runs both forms."""

    ident: str
    bare_record: bool = False
    pc: int = 0

    def steps_total(self) -> int:
        return 9

    def step(self, w: RecordWorld) -> None:
        s = self.pc
        self.pc += 1
        if s == 0:
            assert w.sentinel_holder is None  # exclusive create
            w.sentinel_holder = self.ident
        elif s in (1, 2):
            w.staged[_PAIR_BM25[s - 1]] = True
        elif s == 3:
            w.record_present = True
            w.record_pair = None if self.bare_record else _PAIR_BM25
        elif s in (4, 5):
            name = _PAIR_BM25[s - 4]
            w.swapped[name] = True
            w.staged[name] = False
        elif s == 6:
            w.marker_present = False  # fresh batch-id lineage
        elif s == 7:
            w.record_present = False
        elif s == 8:
            if w.sentinel_holder == self.ident:
                w.sentinel_holder = None  # unlink missing_ok


def _read_record_pair(w: RecordWorld, broken: bool) -> tuple | None:
    """``_commit_record_pair``: ``None`` only when no record exists.
    The FIXED reader maps every on-disk form to its layout's pair (the
    bare form was only ever written by bm25/chunk writers). ``broken``
    restates the PRE-r17 reader, which returned ``None`` for the bare
    and ``compact`` forms — the caller's hint then won the tail gate,
    the exact one-directional guard the r16 verdict reproduced."""
    if not w.record_present:
        return None
    if w.record_pair is not None:
        return w.record_pair
    return None if broken else _PAIR_BM25


@dataclass
class WrongPairRecover:
    """``recover_compaction`` invoked with the MinHash layout's names
    on a bm25/chunk layout (the mis-invocation direction the r16
    verdict empirically reproduced), one atomic read/mutation per step
    (bm25_index.py:1260-1351):

      0 read record existence (``roll_forward``)
      1 re-read the record → pair (record vanished → caller fallback,
        the code's ``or artifact_pair`` — reachable only recordless)
      2 artifact repair over the CALLER's names (features/bands do not
        exist on this layout — a no-op, modeled as such)
      3 tail gate: ``roll_forward and set(pair) <= set(names)`` →
        marker write/unlink + record unlink (THE consumption)
      4 record still present → RAISE (refusal, before any sweep); else
        claim sweep + sentinel clear

    ``mutated`` records every world change the recover makes, so the
    refusal-is-a-no-op invariant is checked mechanically."""

    ident: str
    names: tuple = _PAIR_MINHASH
    broken_reader: bool = False
    pc: int = 0
    roll_forward: bool | None = None
    pair: tuple | None = None
    raised: bool = False
    consumed_record: bool = False
    mutated: list = field(default_factory=list)

    def steps_total(self) -> int:
        return 5

    def step(self, w: RecordWorld) -> None:
        s = self.pc
        self.pc += 1
        if self.raised:
            return
        if s == 0:
            self.roll_forward = w.record_present
        elif s == 1:
            self.pair = _read_record_pair(w, self.broken_reader) or self.names
        elif s == 2:
            pass  # caller-named artifacts absent on this layout
        elif s == 3:
            if self.roll_forward and set(self.pair) <= set(self.names):
                if w.marker_present:
                    w.marker_present = False  # rebuild-form tail
                    self.mutated.append("marker")
                if w.record_present:
                    w.record_present = False
                    self.consumed_record = True
                    self.mutated.append("record")
        elif s == 4:
            if w.record_present:
                self.raised = True  # refusal BEFORE the claim sweep
            else:
                if w.sentinel_holder is not None:
                    w.sentinel_holder = None
                    self.mutated.append("sentinel")


def _sweep_record_gate(
    bare_record: bool, broken_reader: bool
) -> tuple[int, int, int]:
    """Every interleaving of a wrong-pair recover's 5 steps with the
    first k steps of a live rebuild, for EVERY crash point k (0..9 —
    k=9 is the crash-free lifecycle). Returns (n_interleavings,
    n_refusals, n_consumed); asserts per interleaving that

    - the recover never consumes a live record (its pair can never
      satisfy the wrong-layout gate — the r17 guarantee);
    - a refusing recover mutated NOTHING (marker, record, sentinel);
    - the END state is repairable: a half-swapped layout (postings
      swapped, stats not) still carries its commit record, so the
      right-pair recover can finish the committed swap — the exact
      stranded state the r16 verdict reproduced is unreachable.
    """
    n_inter = n_refused = n_consumed = 0
    for k in range(10):
        for sched in _multiset_permutations({"b": k, "r": 5}):
            n_inter += 1
            w = RecordWorld()
            rb = RecordRebuild("b", bare_record=bare_record)
            rc = WrongPairRecover("r", broken_reader=broken_reader)
            for aid in sched:
                (rb if aid == "b" else rc).step(w)
            n_refused += rc.raised
            n_consumed += rc.consumed_record
            assert not rc.consumed_record, (
                f"RECORD CONSUMED by wrong-pair recover under crash "
                f"point k={k}, schedule {sched}"
            )
            if rc.raised:
                assert not rc.mutated, (k, sched, rc.mutated)
            if w.swapped["postings"] != w.swapped["stats"]:
                assert w.record_present, (
                    f"STRANDED MIXED STATE (half-swapped, no record) "
                    f"under crash point k={k}, schedule {sched}"
                )
    return n_inter, n_refused, n_consumed


def test_wrong_pair_recover_never_consumes_record_any_crash_point():
    """The r17 pairspec-unconditional form: sweep all 5005 interleavings
    (sum over k of C(k+5,5) = C(15,6)) of a wrong-pair recover vs a
    live pair-qualified rebuild at every crash point. The recover must
    refuse whenever it reaches its gate with the record on disk, never
    consume it, and never leave the half-swapped/no-record state."""
    n_inter, n_refused, n_consumed = _sweep_record_gate(
        bare_record=False, broken_reader=False
    )
    assert n_inter == 5005
    assert n_refused > 0   # the refusal path was actually exercised
    assert n_consumed == 0


def test_wrong_pair_recover_refuses_on_bare_record_form_too():
    """The pre-r17 bare ``rebuild`` payload, read by the FIXED reader
    (bare → the bm25/chunk default pair): the wrong-pair recover
    refuses identically — the bare form is self-describing because
    only the bm25/chunk writers ever wrote it."""
    n_inter, n_refused, n_consumed = _sweep_record_gate(
        bare_record=True, broken_reader=False
    )
    assert n_inter == 5005
    assert n_refused > 0
    assert n_consumed == 0


def test_record_gate_model_detects_the_pre_r17_reader():
    """Negative control — the sweep has teeth: restate the PRE-r17
    ``_commit_record_pair`` (bare/compact forms → ``None`` → the
    CALLER's hint wins the gate) and the sweep must find the r16
    verdict's exact witness: the wrong-pair recover consumes the bare
    record mid-swap and strands the half-swapped layout recordless."""
    import pytest

    with pytest.raises(AssertionError, match="RECORD CONSUMED"):
        _sweep_record_gate(bare_record=True, broken_reader=True)


@dataclass
class RecordCompactor:
    """``compact_postings_index``'s commit phase on the bm25/chunk
    layout — the writer of the ``compact <wm>`` record form, the exact
    form the r16 ADVICE #1 repro consumed (it carried no pairspec, so
    the pre-r17 reader fell back to the caller's hint). One atomic op
    per step: acquire sentinel → stage both ``.compact`` artifacts →
    write ``compact <wm>`` → swap both → write marker(wm) → unlink
    record → release. Differs from the rebuild in the tail: the
    watermark marker is (re)WRITTEN with the recorded value, not
    unlinked — a compaction carries its lineage forward."""

    ident: str
    pc: int = 0

    def steps_total(self) -> int:
        return 9

    def step(self, w: RecordWorld) -> None:
        s = self.pc
        self.pc += 1
        if s == 0:
            assert w.sentinel_holder is None
            w.sentinel_holder = self.ident
        elif s in (1, 2):
            w.staged[_PAIR_BM25[s - 1]] = True
        elif s == 3:
            w.record_present = True
            # the compact form never carries a pairspec on disk; the
            # FIXED reader maps it to the bm25/chunk pair (only those
            # layouts have a compactor)
            w.record_pair = None
        elif s in (4, 5):
            name = _PAIR_BM25[s - 4]
            w.swapped[name] = True
            w.staged[name] = False
        elif s == 6:
            w.marker_present = True  # marker re-written with the wm
        elif s == 7:
            w.record_present = False
        elif s == 8:
            if w.sentinel_holder == self.ident:
                w.sentinel_holder = None


def _sweep_record_gate_compactor(broken_reader: bool) -> tuple[int, int, int]:
    """The wrong-pair recover swept against every crash point of a
    live COMPACTION — the ``compact <wm>`` record form. Same
    invariants as the rebuild sweep."""
    n_inter = n_refused = n_consumed = 0
    for k in range(10):
        for sched in _multiset_permutations({"c": k, "r": 5}):
            n_inter += 1
            w = RecordWorld()
            cp = RecordCompactor("c")
            rc = WrongPairRecover("r", broken_reader=broken_reader)
            for aid in sched:
                (cp if aid == "c" else rc).step(w)
            n_refused += rc.raised
            n_consumed += rc.consumed_record
            assert not rc.consumed_record, (
                f"RECORD CONSUMED by wrong-pair recover (compact form) "
                f"under crash point k={k}, schedule {sched}"
            )
            if rc.raised:
                assert not rc.mutated, (k, sched, rc.mutated)
            if w.swapped["postings"] != w.swapped["stats"]:
                assert w.record_present, (
                    f"STRANDED MIXED STATE (half-swapped, no record) "
                    f"under crash point k={k}, schedule {sched}"
                )
    return n_inter, n_refused, n_consumed


def test_wrong_pair_recover_never_consumes_compact_record():
    """The ``compact <wm>`` form — the r16 ADVICE #1 repro's record:
    the FIXED reader maps it to the bm25/chunk pair, so the wrong-pair
    recover refuses at every one of the 5005 schedules, never consumes
    the record, and never strands the half-swapped layout."""
    n_inter, n_refused, n_consumed = _sweep_record_gate_compactor(
        broken_reader=False
    )
    assert n_inter == 5005
    assert n_refused > 0
    assert n_consumed == 0


def test_compact_record_gate_model_detects_the_pre_r17_reader():
    """Negative control for the compact form: the pre-r17 reader
    (compact → None → caller's hint wins) must let the sweep find the
    ADVICE #1 witness — the mis-invoked recover consumes the compact
    record mid-swap and strands the layout recordless."""
    import pytest

    with pytest.raises(AssertionError, match="RECORD CONSUMED"):
        _sweep_record_gate_compactor(broken_reader=True)
