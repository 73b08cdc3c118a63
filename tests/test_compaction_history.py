"""system.compaction_history: every merge path records a row (stcs /
twcs / lcs / ucs / major / twcs whole-segment drop), the virtual table
serves full CQL SELECT semantics, and the pk restriction passes the
gate."""

from __future__ import annotations

from cassandra_spark.cql_session import CqlSession


def test_merge_paths_record_history(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute(
        "CREATE TABLE lt (k text PRIMARY KEY, v int) WITH compaction = "
        "{'class': 'LeveledCompactionStrategy'}"
    )
    t = sess.table("lt")
    t.lcs_target_bytes = 1 << 20
    for g in range(4):
        for i in range(5):
            sess.execute(f"INSERT INTO lt (k, v) VALUES ('k{g}{i}', {i})")
        t.flush()
    t.lcs_compact()
    tags = [h[1] for h in t.compaction_history]
    assert "lcs" in tags
    rec = t.compaction_history[0]
    assert rec[3] == 4 and rec[4] >= 1  # 4 L0 inputs -> >= 1 output
    assert rec[7] == rec[8] == 40  # 20 inserts = 40 mutation rows, kept

    rows = sess.execute(
        "SELECT compaction_type, n_inputs FROM system.compaction_history "
        "WHERE columnfamily_name = 'lt'"
    ).collect()
    assert [(r.compaction_type, r.n_inputs) for r in rows] == [("lcs", 4)]


def test_twcs_whole_drop_records_zero_output_row(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute(
        "CREATE TABLE tw (k text PRIMARY KEY, v int) WITH compaction = "
        "{'class': 'TimeWindowCompactionStrategy', "
        "'compaction_window_unit': 'MINUTES', 'compaction_window_size': "
        "'1'}"
    )
    t = sess.table("tw")
    # whole segment of TTL'd cells in window 0; enough later statements
    # that the session clock passes the expiry horizon (the drop guard
    # judges by min(clock, max_wt + 1))
    minute = 60_000_000
    sess.execute("INSERT INTO tw (k, v) VALUES ('old', 1) "
                 "USING TIMESTAMP 1 AND TTL 5")
    t.flush()
    for i in range(8):
        sess.execute(f"INSERT INTO tw (k, v) VALUES ('n{i}', {i}) "
                     f"USING TIMESTAMP {2 * minute + i}")
    t.flush()
    t.twcs_compact()
    drops = [h for h in t.compaction_history if h[1] == "twcs-drop"]
    assert len(drops) == 1
    assert drops[0][4] == 0 and drops[0][8] == 0  # no outputs, no rows out
    assert drops[0][7] == 2  # the dropped segment held marker + cell
