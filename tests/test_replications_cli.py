"""Integration test for the ``replications`` CLI command: drive three
replication sequences end-to-end through ``python -m ohsome_planet_spark.cli
replications`` against a file:// mirror and check the written parquet
matches the incremental updater run directly
(``cmd/Replications.java:27-130``, ``ReplicationManager.java:33-137``,
``ContributionStateManager.java:116-245``)."""

import gzip
import json
import os
from datetime import datetime, timezone
from types import SimpleNamespace

import pytest

from ohsome_planet_spark.cli import main
from ohsome_planet_spark.streaming.manager import run_replication_update
from ohsome_planet_spark.streaming.replication import (
    IncrementalUpdater,
    ReplicationState,
)
from ohsome_planet_spark.streaming.server import entity_server, file_fetch

OSC = {
    101: """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="test">
  <create>
    <node id="1" version="1" timestamp="2025-10-22T09:01:00Z" uid="1" user="One" changeset="11" lat="1.0" lon="1.0">
      <tag k="amenity" v="cafe"/>
    </node>
    <node id="2" version="1" timestamp="2025-10-22T09:01:00Z" uid="1" user="One" changeset="11" lat="1.0" lon="2.0"/>
    <way id="10" version="1" timestamp="2025-10-22T09:01:00Z" uid="1" user="One" changeset="11">
      <nd ref="1"/><nd ref="2"/>
      <tag k="highway" v="residential"/>
    </way>
  </create>
</osmChange>""",
    102: """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="test">
  <modify>
    <node id="1" version="2" timestamp="2025-10-22T09:02:00Z" uid="1" user="One" changeset="12" lat="1.5" lon="1.0">
      <tag k="amenity" v="cafe"/>
    </node>
  </modify>
</osmChange>""",
    103: """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="test">
  <create>
    <node id="3" version="1" timestamp="2025-10-22T09:03:00Z" uid="2" user="Two" changeset="13" lat="1.0" lon="3.0"/>
  </create>
  <modify>
    <way id="10" version="2" timestamp="2025-10-22T09:03:00Z" uid="2" user="Two" changeset="13">
      <nd ref="1"/><nd ref="2"/><nd ref="3"/>
      <tag k="highway" v="primary"/>
    </way>
  </modify>
</osmChange>""",
}
TS = {
    100: "2025-10-22T09:00:30Z",
    101: "2025-10-22T09:01:30Z",
    102: "2025-10-22T09:02:30Z",
    103: "2025-10-22T09:03:30Z",
}


@pytest.fixture()
def mirror(tmp_path):
    root = tmp_path / "mirror"
    seq_dir = root / "000" / "000"
    seq_dir.mkdir(parents=True)
    for seq, xml in OSC.items():
        (seq_dir / f"{seq:03d}.osc.gz").write_bytes(gzip.compress(xml.encode()))
    for seq, ts in TS.items():
        state = f"sequenceNumber={seq}\ntimestamp={ts.replace(':', chr(92) + ':')}\n"
        (seq_dir / f"{seq:03d}.state.txt").write_text(state)
        if seq == max(TS):
            (root / "state.txt").write_text(state)
    return str(root)


def _key_rows(df):
    return {
        (r.osm_type, r.osm_id, r.osm_version, r.osm_minor_version, r.osm_edits,
         str(r.valid_from), r.contrib_type)
        for r in df.collect()
    }


def test_replications_cli_three_sequences(spark, mirror, tmp_path, capsys):
    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    argv = [
        "replications", "--data", data, "--parquet-data", out,
        "--endpoint", f"file://{mirror}", "--jcb", "--start-sequence", "100",
    ]
    assert main(argv) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["applied_sequences"] == [101, 102, 103]
    assert report["contribution_state"] == 103

    # published artifacts (per-sequence parquet + state, top-level state)
    for seq in (101, 102, 103):
        assert os.path.isdir(os.path.join(out, f"000/000/{seq:03d}.opc.parquet"))
        assert os.path.exists(os.path.join(out, f"000/000/{seq:03d}.state.txt"))
    top = ReplicationState.parse(open(os.path.join(out, "state.txt")).read())
    assert top.sequence == 103
    csv_text = open(os.path.join(out, "state.csv")).read()
    assert "103" in csv_text and "103.opc.parquet" in csv_text
    local = ReplicationState.parse(open(os.path.join(data, "state.txt")).read())
    assert local.sequence == 103

    # the written parquet for each sequence matches the incremental
    # updater driven directly (with the manager's F5 tag-less filter)
    server = entity_server("local://mirror/", fetch=file_fetch(mirror))
    upd = IncrementalUpdater(
        spark,
        spark.createDataFrame([], "osm_type string, osm_id bigint, version int,"
                              " ts timestamp, changeset bigint, user_id int,"
                              " user_name string, visible boolean,"
                              " tags map<string,string>, lon double, lat double"),
        spark.createDataFrame([], "osm_type string, osm_id bigint, version int,"
                              " ts timestamp, changeset bigint, user_id int,"
                              " user_name string, visible boolean,"
                              " tags map<string,string>, refs array<bigint>"),
    )
    from pyspark.sql import functions as F

    results = upd.apply_sequences(server, [101, 102, 103])
    for seq, (node_c, way_c) in zip((101, 102, 103), results):
        direct = node_c.unionByName(way_c, allowMissingColumns=True).filter(
            (F.size(F.coalesce("tags", F.create_map())) > 0)
            | (F.size(F.coalesce("tags_before", F.create_map())) > 0)
        )
        written = spark.read.parquet(os.path.join(out, f"000/000/{seq:03d}.opc.parquet"))
        assert _key_rows(written) == _key_rows(direct), f"seq {seq}"

    # seq 103 touches node 3 (untagged -> dropped by the F5 filter) and
    # way 10 (tagged -> rebuilt); node 1 is unaffected so not re-emitted
    w103 = spark.read.parquet(os.path.join(out, "000/000/103.opc.parquet"))
    assert {r.osm_id for r in w103.select("osm_id").collect()} == {10}

    # history tables are durable: way 10's latest stored version is 2
    ways = spark.read.parquet(os.path.join(data, "ways"))
    assert ways.filter("osm_id = 10").agg(F.max("version")).first()[0] == 2

    # the reference writes bloom filters on update files
    # (ContributionStateManager.java:159-174); assert they actually exist
    # in the written INCREMENTAL outputs' footers (parquet-mr via the JVM;
    # pyarrow 16 doesn't surface bloom offsets)
    for seq in (101, 102, 103):
        _assert_bloom_filter(
            spark, os.path.join(out, f"000/000/{seq:03d}.opc.parquet"), "osm_id"
        )


def _assert_bloom_filter(spark, directory: str, column: str) -> None:
    import glob

    files = [
        f for f in glob.glob(os.path.join(directory, "*.parquet"))
        if os.path.getsize(f) > 0
    ]
    assert files, f"no parquet files under {directory}"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    offsets = []
    for f in files:
        path = jvm.org.apache.hadoop.fs.Path("file://" + os.path.abspath(f))
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            path, conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            for block in reader.getFooter().getBlocks():
                for col in block.getColumns():
                    if col.getPath().toDotString() == column:
                        offsets.append(col.getBloomFilterOffset())
        finally:
            reader.close()
    assert offsets and all(o >= 0 for o in offsets), (
        f"bloom filter missing for {column} in {directory}: {offsets}"
    )


def test_replications_cli_noop_when_caught_up(spark, mirror, tmp_path, capsys):
    data = str(tmp_path / "data")
    argv = [
        "replications", "--data", data, "--parquet-data", str(tmp_path / "out"),
        "--endpoint", f"file://{mirror}", "--jcb", "--start-sequence", "100",
    ]
    assert main(argv) == 0
    capsys.readouterr()
    # second run: local == remote, nothing applied, state unchanged
    assert main(argv) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["applied_sequences"] == []
    assert report["contribution_state"] == 103


def test_holdback_logic_dual_stream():
    """R2 holdback wiring (``ReplicationManager.java:57-75``): when the
    changeset stream is keeping up (lag < 180 s) contributions are held to
    its timestamp; when it lags badly, contributions run free."""
    calls = {}

    class FakeContribs:
        changeset_store = None

        def fetch_remote_state(self):
            return ReplicationState(10, "2025-10-22T09:10:00+00:00")

        def update_to_remote_state(self, remote, process_until=None):
            calls["until"] = process_until
            return 0

    class FakeChangesets:
        local_state = ReplicationState(5, "2025-10-22T09:09:00+00:00")

        def __init__(self, ts):
            self.server = SimpleNamespace(
                get_latest_remote_state=lambda: ReplicationState(5, ts)
            )

        def update_to_remote_state(self, state, remote):
            return state

        def update_unclosed_changesets(self, state, now):
            return state

    # changeset stream 60 s behind -> holdback to its timestamp
    run_replication_update(FakeContribs(), FakeChangesets("2025-10-22T09:09:00+00:00"))
    assert calls["until"] == datetime(2025, 10, 22, 9, 9, tzinfo=timezone.utc)

    # changeset stream 10 min behind -> no holdback
    run_replication_update(FakeContribs(), FakeChangesets("2025-10-22T09:00:00+00:00"))
    assert calls["until"] is None


REF_FIXTURES = "/root/reference/ohsome-replication-update/src/test/resources/replication"


@pytest.mark.skipif(not os.path.isdir(REF_FIXTURES), reason="fixtures absent")
def test_replications_cli_dual_stream(spark, tmp_path, capsys):
    """Full dual-stream pass over the vendored public fixtures: changesets
    catch up (6737400-401), then contributions (6824840-842) run without
    holdback because the changeset stream lags by days
    (``ReplicationManager.update``). The >2 h open-changeset API
    reconciliation is unreachable through the file transport and must be
    skipped, not crash."""
    data = str(tmp_path / "data")
    argv = [
        "replications", "--data", data, "--parquet-data", str(tmp_path / "out"),
        "--endpoint", f"file://{REF_FIXTURES}/minute",
        "--replication-changesets", f"file://{REF_FIXTURES}/changesets",
        "--start-sequence", "6824839",
        "--changeset-start-sequence", "6737398",
    ]
    assert main(argv) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["applied_sequences"] == [6824840, 6824841, 6824842]
    assert report["contribution_state"] == 6824842
    # files 6737400-401 were applied; the stream's NNN.state.txt carries
    # sequence N-1 (offset-by-one convention), so the local state lands on
    # 6737400 == the remote state: caught up
    assert report["changeset_state"] == 6737400

    # the changeset store was materialized and carries real fixture rows
    store = spark.read.parquet(os.path.join(data, "changesets"))
    assert store.count() > 0
    assert "geom" in store.columns
    state_text = open(os.path.join(data, "changeset_state.txt")).read()
    assert "6737400" in state_text


def test_replication_store_peek(spark, mirror, tmp_path, capsys):
    """`replication-store` shows latest stored entity + derived
    back-references (UpdateStoreRocksDb.query:36-57, docs/CLI.md)."""
    data = str(tmp_path / "data")
    argv = [
        "replications", "--data", data, "--parquet-data", str(tmp_path / "out"),
        "--endpoint", f"file://{mirror}", "--jcb", "--start-sequence", "100",
    ]
    assert main(argv) == 0
    capsys.readouterr()

    assert main(["replication-store", "--data", data, "n/1", "n/3", "w/10", "n/99"]) == 0
    out = json.loads(capsys.readouterr().out)

    # n/1: latest stored version is 2 (modified in seq 102), lat moved
    assert out["n/1"]["entity"]["version"] == 2
    assert out["n/1"]["entity"]["lat"] == 1.5
    # back-reference: way 10 contains node 1
    assert out["n/1"]["ways"] == [10]
    # n/3 was created untagged in 103 but IS in the node store (ways need it)
    assert out["n/3"]["entity"]["version"] == 1
    assert out["n/3"]["ways"] == [10]
    # w/10: latest version 2 with the 3-node ref list
    assert out["w/10"]["entity"]["version"] == 2
    assert out["w/10"]["entity"]["refs"] == [1, 2, 3]
    # unknown element -> explicit null, like the reference's -1 sentinels
    assert out["n/99"]["entity"] is None
    assert out["n/99"]["ways"] == []


HANDOFF_OSC_101 = """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="test">
  <modify>
    <node id="5" version="2" timestamp="2025-10-22T09:01:00Z" uid="1" user="One" changeset="21" lat="3.5" lon="3.0">
      <tag k="amenity" v="cafe"/>
    </node>
  </modify>
</osmChange>"""


@pytest.fixture()
def handoff_mirror(tmp_path):
    root = tmp_path / "mirror2"
    seq_dir = root / "000" / "000"
    seq_dir.mkdir(parents=True)
    (seq_dir / "101.osc.gz").write_bytes(gzip.compress(HANDOFF_OSC_101.encode()))
    for seq, ts in ((100, "2025-10-22T09:00:30Z"), (101, "2025-10-22T09:01:30Z")):
        state = f"sequenceNumber={seq}\ntimestamp={ts.replace(':', chr(92) + ':')}\n"
        (seq_dir / f"{seq:03d}.state.txt").write_text(state)
        if seq == 101:
            (root / "state.txt").write_text(state)
    return str(root)


def test_bulk_to_incremental_handoff(spark, handoff_mirror, tmp_path, capsys):
    """`contributions --replication-endpoint` seeds the replication stores
    and start state from the PBF; a later `replications` run continues
    seamlessly (docs/CLI.md "Initialize for Replication",
    Contributions2Parquet.java:109-201)."""
    from datetime import datetime, timezone

    from tests.pbf_encoder import encode_block, write_pbf

    def ms(iso):
        return int(datetime.fromisoformat(iso).replace(
            tzinfo=timezone.utc).timestamp() * 1000)

    nodes = [
        dict(osm_id=5, version=1, ts_ms=ms("2025-10-22T09:00:00"), changeset=20,
             uid=1, user="One", visible=True, tags={"amenity": "pub"},
             lon=3.0, lat=3.0),
        dict(osm_id=6, version=1, ts_ms=ms("2025-10-22T09:00:00"), changeset=20,
             uid=1, user="One", visible=True, tags={}, lon=4.0, lat=3.0),
    ]
    ways = [
        dict(osm_id=20, version=1, ts_ms=ms("2025-10-22T09:00:40"), changeset=20,
             uid=1, user="One", visible=True,
             tags={"highway": "residential"}, refs=[5, 6]),
    ]
    pbf = str(tmp_path / "seed.osh.pbf")
    write_pbf(pbf, [encode_block(dense_nodes=nodes), encode_block(ways=ways)])

    out = str(tmp_path / "contribs")
    data = str(tmp_path / "data")
    assert main([
        "contributions", "--pbf", pbf, "--out", out,
        "--data", data, "--replication-endpoint", f"file://{handoff_mirror}",
    ]) == 0
    capsys.readouterr()

    # seeded stores + start state (greatest state ts <= max entity ts)
    st = ReplicationState.parse(open(os.path.join(data, "state.txt")).read())
    assert st.sequence == 100
    assert os.path.exists(os.path.join(out, "state.txt"))
    seeded_nodes = spark.read.parquet(os.path.join(data, "nodes"))
    assert {r.osm_id for r in seeded_nodes.select("osm_id").collect()} == {5, 6}

    # incremental continuation applies seq 101 against the seeded history
    out2 = str(tmp_path / "updates")
    assert main([
        "replications", "--data", data, "--parquet-data", out2,
        "--endpoint", f"file://{handoff_mirror}", "--jcb",
    ]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["applied_sequences"] == [101]

    w101 = spark.read.parquet(os.path.join(out2, "000/000/101.opc.parquet"))
    rows = {(r.osm_type, r.osm_id): r for r in w101.collect()}
    # node 5 v2: the seeded v1 history makes this the second edit
    n5 = rows[("node", 5)]
    assert n5.osm_version == 2 and n5.osm_edits == 2
    assert n5.contrib_type == "TAG_GEOMETRY"
    # dirty propagation rebuilt way 20 with node 5's new position
    w20 = rows[("way", 20)]
    assert w20.osm_version == 1 and w20.osm_minor_version == 1
    # replication-store peek sees the merged history
    capsys.readouterr()
    assert main(["replication-store", "--data", data, "n/5"]) == 0
    peek = json.loads(capsys.readouterr().out)
    assert peek["n/5"]["entity"]["version"] == 2
    assert peek["n/5"]["ways"] == [20]
