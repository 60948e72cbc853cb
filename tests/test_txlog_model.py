"""Model-based testing of the transactional table format: hypothesis drives
random op sequences (append / delete / overwrite / compact / restore) against
both the real TxTable and a trivial in-memory model (a list of (id, v) rows +
a version history); after every op the table must equal the model, and time
travel to any recorded version must equal the model's history."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from snapshot_sender_spark.operators.txlog import TxTable


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.collect())


class _Model:
    def __init__(self):
        self.live: list[tuple[int, int]] = []
        self.history: dict[int, list[tuple[int, int]]] = {}
        self.version = 0

    def snap(self):
        self.version += 1
        self.history[self.version] = sorted(self.live)


_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 49), st.integers(1, 6)),
    st.tuples(st.just("delete"), st.integers(0, 9), st.just(0)),
    st.tuples(st.just("delete_mor"), st.integers(0, 9), st.just(0)),
    st.tuples(st.just("merge_cow"), st.integers(0, 49), st.integers(1, 5)),
    st.tuples(st.just("merge_mor"), st.integers(0, 49), st.integers(1, 5)),
    st.tuples(st.just("apply"), st.integers(0, 49), st.integers(2, 6)),
    st.tuples(st.just("overwrite"), st.integers(0, 49), st.integers(1, 4)),
    st.tuples(st.just("compact"), st.just(0), st.just(0)),
    st.tuples(st.just("restore"), st.integers(1, 8), st.just(0)),
    # partition-spec evolution (round 12): toggles flat <-> by-v; contents
    # must be invariant, and every other op must keep working on whichever
    # spec is current (including restore ACROSS a respec)
    st.tuples(st.just("repartition"), st.just(0), st.just(0)),
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=1, max_size=7))
def test_txlog_matches_model_under_random_op_sequences(spark, tmp_path_factory, ops):
    t = TxTable(spark, str(tmp_path_factory.mktemp("model") / "tab"))
    # tiny inline cap: merge-on-read ops regularly cross into the SIDECAR
    # vector regime, so the model exercises both physical forms
    t.MOR_MAX_INLINE_DV = 3
    m = _Model()

    def mk(lo, n):
        return spark.createDataFrame(
            [(lo + i, (lo + i) % 7) for i in range(n)], "id long, v long"
        ).coalesce(1)

    t.append(mk(0, 5), ts=0.0)
    m.live = [(i, i % 7) for i in range(5)]
    m.snap()

    for kind, a, b in ops:
        ts = float(m.version + 1)
        if kind == "append":
            t.append(mk(a, b), ts=ts)
            m.live += [(a + i, (a + i) % 7) for i in range(b)]
            m.snap()
        elif kind in ("delete", "delete_mor"):
            v_before = t.latest_version()
            t.delete_where(
                f"id % 10 = {a}", ts=ts,
                mode="mor" if kind == "delete_mor" else "cow",
            )
            kept = [(i, v) for (i, v) in m.live if i % 10 != a]
            if t.latest_version() != v_before:  # no-op deletes commit nothing
                m.live = kept
                m.snap()
            else:
                # a no-op delete implies no model row matched the predicate
                assert sorted(kept) == sorted(m.live)
        elif kind in ("merge_cow", "merge_mor"):
            src = [(a + i, 99) for i in range(b)]
            t.merge(
                spark.createDataFrame(src, "id long, v long").coalesce(1),
                keys=["id"], ts=ts,
                mode="mor" if kind == "merge_mor" else "cow",
            )
            src_ids = {i for i, _v in src}
            m.live = [(i, v) for (i, v) in m.live if i not in src_ids] + src
            m.snap()
        elif kind == "apply":
            # a CDF batch: delete the first half of the key range, upsert the
            # second half (update-shaped rows carry delete(old)+insert(new))
            del_ids = list(range(a, a + b // 2))
            ins = [(a + i, 77) for i in range(b // 2, b)]
            changes = [(i, 0, "delete", 1) for i in del_ids] + [
                (i, v, "insert", 1) for i, v in ins
            ]
            t.apply_changes(
                spark.createDataFrame(
                    changes, "id long, v long, _change_type string, _commit_version long"
                ).coalesce(1),
                keys=["id"], ts=ts,
            )
            ins_ids = {i for i, _v in ins}
            m.live = [
                (i, v) for (i, v) in m.live
                if i not in set(del_ids) and i not in ins_ids
            ] + ins
            m.snap()
        elif kind == "overwrite":
            t.overwrite(mk(a, b), ts=ts)
            m.live = [(a + i, (a + i) % 7) for i in range(b)]
            m.snap()
        elif kind == "compact":
            v_before = t.latest_version()
            t.compact(target_files=1, ts=ts)
            if t.latest_version() != v_before:
                m.snap()  # contents unchanged
        elif kind == "restore":
            target = min(a, m.version)
            t.restore(target, ts=ts)
            m.live = list(m.history[target])
            m.snap()
        elif kind == "repartition":
            new_spec = () if t.snapshot().partition_by else ("v",)
            t.repartition_table(new_spec, target_files=1, ts=ts)
            assert t.snapshot().partition_by == new_spec
            m.snap()  # contents unchanged, layout evolved
        assert _rows(t.read()) == sorted(m.live), (kind, a, b)

    # time travel across the whole recorded history (no vacuum ran)
    for v, expected in m.history.items():
        assert _rows(t.read(version=v)) == expected, f"time travel to v{v}"
