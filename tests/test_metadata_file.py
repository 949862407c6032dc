"""METADATA file operations + partition discovery + CAS coordinator.

Covers the scenario space of the reference's unit tests
(test/unit/metadata_operation_split.cc — split/subsplit at the
begin/middle/end entries, test/unit/metadata_operation_createpartition.cc,
test/unit/partition_discovery.cc — SERVE/LOAD/UNLOAD by keyrange and by
id, test/unit/metadata_store.cc) against our JSON metadata chain.
"""

import pytest

from eventql_tpu.config.config_directory import ConfigDirectory
from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.db.metadata_file import (
    MFILE_FINITE,
    MFILE_USERDEFINED,
    METAOP_CREATE_PARTITION,
    METAOP_FINALIZE_JOIN,
    METAOP_FINALIZE_SPLIT,
    METAOP_JOIN_SERVERS,
    METAOP_REMOVE_DEAD_SERVERS,
    METAOP_SPLIT_PARTITION,
    MetadataFile,
    MetadataOperation,
    PartitionEntry,
    Placement,
    discover_partition,
)
from eventql_tpu.db.metadata_service import (
    MetadataCoordinator,
    MetadataService,
    MetadataStore,
    file_checksum,
)


def mkfile(entries, keyspace="uint64", flags=0, txnid="t0", seq=1):
    return MetadataFile(
        txnid=txnid,
        seq=seq,
        keyspace=keyspace,
        partition_key="time",
        entries=entries,
        flags=flags,
    )


def entry(begin, pid, servers, **kw):
    return PartitionEntry(
        begin, pid, servers=[Placement(s) for s in servers], **kw
    )


def three_partitions():
    # ["", p1) [10, p2) [20, p3)
    return mkfile(
        [
            entry("", "p1", ["s1", "s2"]),
            entry(10, "p2", ["s2", "s3"]),
            entry(20, "p3", ["s3", "s4"]),
        ]
    )


def split_op(pid, point, input_txnid="t0", **kw):
    return MetadataOperation(
        "db1",
        "tbl",
        METAOP_SPLIT_PARTITION,
        {
            "partition_id": pid,
            "split_point": point,
            "split_partition_id_low": f"{pid}_lo",
            "split_partition_id_high": f"{pid}_hi",
            "split_servers_low": ["s5"],
            "split_servers_high": ["s6"],
            "placement_id": 7,
            **kw,
        },
        input_txnid,
    )


# ---------------------------------------------------------------------------
# SPLIT_PARTITION
# ---------------------------------------------------------------------------


class TestSplitPartition:
    @pytest.mark.parametrize(
        "pid,point", [("p1", 5), ("p2", 15), ("p3", 25)]
    )
    def test_split_marks_entry_splitting(self, pid, point):
        out = split_op(pid, point).apply(three_partitions())
        assert out.seq == 2
        e = next(e for e in out.entries if e.partition_id == pid)
        assert e.splitting and e.split_point == point
        assert e.split_partition_id_low == f"{pid}_lo"
        assert [p.server_id for p in e.split_servers_low] == ["s5"]
        assert e.split_servers_low[0].placement_id == 7
        # other entries untouched
        assert len(out.entries) == 3
        assert sum(e.splitting for e in out.entries) == 1

    def test_split_point_below_begin_rejected(self):
        with pytest.raises(RuntimeError_, match="out of range"):
            split_op("p2", 9).apply(three_partitions())

    def test_split_point_at_or_above_end_rejected(self):
        with pytest.raises(RuntimeError_, match="out of range"):
            split_op("p2", 20).apply(three_partitions())

    def test_split_point_equal_begin_allowed(self):
        # reference checks split_point < begin only (strict less)
        out = split_op("p2", 10).apply(three_partitions())
        assert out.entries[1].splitting

    def test_double_split_rejected(self):
        once = split_op("p2", 15).apply(three_partitions())
        with pytest.raises(RuntimeError_, match="already splitting"):
            split_op("p2", 16, input_txnid=once.txnid).apply(once)

    def test_unknown_partition(self):
        with pytest.raises(RuntimeError_, match="not found"):
            split_op("nope", 15).apply(three_partitions())

    def test_empty_split_servers_rejected(self):
        with pytest.raises(RuntimeError_, match="can't be empty"):
            split_op("p2", 15, split_servers_low=[]).apply(
                three_partitions()
            )

    def test_finalize_immediately(self):
        out = split_op("p2", 15, finalize_immediately=True).apply(
            three_partitions()
        )
        pids = [e.partition_id for e in out.entries]
        assert pids == ["p1", "p2_lo", "p2_hi", "p3"]
        lo, hi = out.entries[1], out.entries[2]
        assert (lo.begin, hi.begin) == (10, 15)
        assert [p.server_id for p in lo.servers] == ["s5"]
        assert [p.server_id for p in hi.servers] == ["s6"]
        assert not lo.splitting and not hi.splitting

    @pytest.mark.parametrize("which", ["lo", "hi"])
    @pytest.mark.parametrize("parent", ["p1", "p2", "p3"])
    def test_subsplit_pending_child(self, which, parent):
        """Splitting a pending split child finalizes the parent split
        and leaves the requested child splitting (reference:
        performSplitPartitionLow/High)."""
        base = split_op(parent, {"p1": 5, "p2": 15, "p3": 25}[parent]).apply(
            three_partitions()
        )
        child = f"{parent}_{which}"
        point = {
            ("p1", "lo"): 2, ("p1", "hi"): 7,
            ("p2", "lo"): 12, ("p2", "hi"): 17,
            ("p3", "lo"): 22, ("p3", "hi"): 27,
        }[(parent, which)]
        out = split_op(child, point, input_txnid=base.txnid).apply(base)
        pids = [e.partition_id for e in out.entries]
        assert f"{parent}_lo" in pids and f"{parent}_hi" in pids
        assert parent not in pids
        target = next(e for e in out.entries if e.partition_id == child)
        other = next(
            e
            for e in out.entries
            if e.partition_id.startswith(parent) and e.partition_id != child
        )
        assert target.splitting and target.split_point == point
        assert not other.splitting
        # children inherit the recorded split server lists
        assert [p.server_id for p in target.servers] == (
            ["s5"] if which == "lo" else ["s6"]
        )

    def test_subsplit_point_out_of_child_range(self):
        base = split_op("p2", 15).apply(three_partitions())
        # low child covers [10, 15): 17 is out of range
        with pytest.raises(RuntimeError_, match="out of range"):
            split_op("p2_lo", 17, input_txnid=base.txnid).apply(base)

    def test_user_defined_partitions_cannot_split(self):
        f = mkfile(
            [entry(1, "p1", ["s1"])], flags=MFILE_USERDEFINED
        )
        with pytest.raises(RuntimeError_, match="user defined"):
            split_op("p1", 5).apply(f)


# ---------------------------------------------------------------------------
# FINALIZE_SPLIT / JOIN / REMOVE_DEAD
# ---------------------------------------------------------------------------


class TestOtherOps:
    def test_finalize_split(self):
        base = split_op("p2", 15).apply(three_partitions())
        out = MetadataOperation(
            "db1",
            "tbl",
            METAOP_FINALIZE_SPLIT,
            {"partition_id": "p2"},
            base.txnid,
        ).apply(base)
        pids = [e.partition_id for e in out.entries]
        assert pids == ["p1", "p2_lo", "p2_hi", "p3"]
        assert out.entries[1].begin == 10 and out.entries[2].begin == 15
        assert not any(e.splitting for e in out.entries)

    def test_finalize_split_not_splitting(self):
        with pytest.raises(RuntimeError_, match="not splitting"):
            MetadataOperation(
                "db1",
                "tbl",
                METAOP_FINALIZE_SPLIT,
                {"partition_id": "p2"},
                "t0",
            ).apply(three_partitions())

    def test_join_and_finalize_join(self):
        f = three_partitions()
        joined = MetadataOperation(
            "db1",
            "tbl",
            METAOP_JOIN_SERVERS,
            {
                "ops": [
                    {"partition_id": "p1", "server_id": "s9",
                     "placement_id": 3}
                ]
            },
            f.txnid,
        ).apply(f)
        e = joined.entries[0]
        assert [p.server_id for p in e.servers_joining] == ["s9"]
        # joining again is an error
        with pytest.raises(RuntimeError_, match="already exists"):
            MetadataOperation(
                "db1",
                "tbl",
                METAOP_JOIN_SERVERS,
                {"ops": [{"partition_id": "p1", "server_id": "s9"}]},
                joined.txnid,
            ).apply(joined)
        final = MetadataOperation(
            "db1",
            "tbl",
            METAOP_FINALIZE_JOIN,
            {"partition_id": "p1", "server_id": "s9", "placement_id": 3},
            joined.txnid,
        ).apply(joined)
        e = final.entries[0]
        assert [p.server_id for p in e.servers] == ["s1", "s2", "s9"]
        assert e.servers_joining == []

    def test_finalize_join_wrong_placement(self):
        f = three_partitions()
        joined = MetadataOperation(
            "db1",
            "tbl",
            METAOP_JOIN_SERVERS,
            {"ops": [{"partition_id": "p1", "server_id": "s9",
                      "placement_id": 3}]},
            f.txnid,
        ).apply(f)
        with pytest.raises(RuntimeError_, match="not included"):
            MetadataOperation(
                "db1",
                "tbl",
                METAOP_FINALIZE_JOIN,
                {"partition_id": "p1", "server_id": "s9",
                 "placement_id": 4},
                joined.txnid,
            ).apply(joined)

    def test_remove_dead_servers_strips_every_list(self):
        f = three_partitions()
        f.entries[0].servers_joining.append(Placement("sdead"))
        f.entries[1].servers.append(Placement("sdead"))
        base = split_op("p3", 25).apply(f)
        base.entries[2].split_servers_low.append(Placement("sdead"))
        out = MetadataOperation(
            "db1",
            "tbl",
            METAOP_REMOVE_DEAD_SERVERS,
            {"server_ids": ["sdead"]},
            base.txnid,
        ).apply(base)
        for e in out.entries:
            assert "sdead" not in e.all_server_ids()
            assert "sdead" not in [
                p.server_id
                for p in e.split_servers_low + e.split_servers_high
            ]


class TestCreatePartition:
    def test_infinite_keyspace_rejects_create(self):
        with pytest.raises(RuntimeError_, match="not allowed"):
            MetadataOperation(
                "db1",
                "tbl",
                METAOP_CREATE_PARTITION,
                {"partition_id": "x", "begin": 5, "end": 8,
                 "servers": ["s1"]},
                "t0",
            ).apply(three_partitions())

    def test_finite_create_sorted_insert_and_overlap(self):
        f = mkfile(
            [
                entry(0, "a", ["s1"], end=10),
                entry(20, "c", ["s1"], end=30),
            ],
            flags=MFILE_FINITE,
        )
        out = MetadataOperation(
            "db1",
            "tbl",
            METAOP_CREATE_PARTITION,
            {"partition_id": "b", "begin": 10, "end": 20,
             "servers": ["s2"], "placement_id": 1},
            f.txnid,
        ).apply(f)
        assert [e.partition_id for e in out.entries] == ["a", "b", "c"]
        with pytest.raises(RuntimeError_, match="overlapping"):
            MetadataOperation(
                "db1",
                "tbl",
                METAOP_CREATE_PARTITION,
                {"partition_id": "d", "begin": 25, "end": 35,
                 "servers": ["s2"]},
                out.txnid,
            ).apply(out)

    def test_user_defined_create_duplicate_begin_rejected(self):
        f = mkfile([entry(5, "a", ["s1"])], flags=MFILE_USERDEFINED)
        with pytest.raises(RuntimeError_, match="overlapping"):
            MetadataOperation(
                "db1",
                "tbl",
                METAOP_CREATE_PARTITION,
                {"partition_id": "dup", "begin": 5, "servers": ["s2"]},
                f.txnid,
            ).apply(f)


# ---------------------------------------------------------------------------
# partition discovery
# ---------------------------------------------------------------------------


class TestDiscovery:
    def test_serve_load_unload_by_keyrange(self):
        f = three_partitions()
        f.entries[1].servers_joining.append(Placement("sj"))
        # active server → SERVE, with targets for the other replicas
        r = discover_partition(f, "s2", "p2", keyrange_begin=10)
        assert r.code == "SERVE"
        assert {(t.server_id, t.is_joining) for t in r.replication_targets} \
            == {("s3", False), ("sj", True)}
        assert (r.keyrange_begin, r.keyrange_end) == (10, 20)
        # joining server → LOAD
        assert discover_partition(f, "sj", "p2", keyrange_begin=10).code \
            == "LOAD"
        # unknown server → UNLOAD
        assert discover_partition(f, "sx", "p2", keyrange_begin=10).code \
            == "UNLOAD"

    def test_leaving_server_still_serves(self):
        f = three_partitions()
        f.entries[0].servers_leaving.append(Placement("sl"))
        assert discover_partition(f, "sl", "p1", keyrange_begin="").code \
            == "SERVE"

    def test_split_children_always_load(self):
        base = split_op("p2", 15).apply(three_partitions())
        r = discover_partition(base, "s5", "p2_lo", keyrange_begin=10)
        assert r.code == "LOAD"
        assert (r.keyrange_begin, r.keyrange_end) == (10, 15)
        assert r.replication_targets == []  # s5 is the only low server
        r = discover_partition(base, "s6", "p2_hi", keyrange_begin=15)
        assert r.code == "LOAD"
        assert (r.keyrange_begin, r.keyrange_end) == (15, 20)

    def test_splitting_parent_reports_split_targets(self):
        base = split_op("p2", 15).apply(three_partitions())
        r = discover_partition(base, "s2", "p2", keyrange_begin=10)
        assert r.code == "SERVE" and r.is_splitting
        assert r.split_partition_ids == ["p2_lo", "p2_hi"]
        # while splitting, replication targets are the split children
        assert {(t.partition_id, t.server_id)
                for t in r.replication_targets} \
            == {("p2_lo", "s5"), ("p2_hi", "s6")}
        assert {
            (t.keyrange_begin, t.keyrange_end)
            for t in r.replication_targets
        } == {(10, 15), (15, 20)}

    def test_vanished_partition_unloads_toward_current_owners(self):
        """After FINALIZE_SPLIT, the old partition id discovers UNLOAD
        with targets covering its former keyrange."""
        base = split_op("p2", 15).apply(three_partitions())
        final = MetadataOperation(
            "db1", "tbl", METAOP_FINALIZE_SPLIT,
            {"partition_id": "p2"}, base.txnid,
        ).apply(base)
        r = discover_partition(
            final, "s2", "p2", keyrange_begin=10, keyrange_end=20
        )
        assert r.code == "UNLOAD"
        assert {(t.partition_id, t.server_id)
                for t in r.replication_targets} \
            == {("p2_lo", "s5"), ("p2_hi", "s6")}

    def test_discover_by_id(self):
        f = three_partitions()
        r = discover_partition(f, "s3", "p3", lookup_by_id=True)
        assert r.code == "SERVE"
        assert (r.keyrange_begin, r.keyrange_end) == (20, "")
        assert discover_partition(f, "zz", "p1", lookup_by_id=True).code \
            == "UNLOAD"
        assert discover_partition(f, "zz", "gone", lookup_by_id=True).code \
            == "UNLOAD"
        base = split_op("p1", 5).apply(f)
        r = discover_partition(base, "s5", "p1_lo", lookup_by_id=True)
        assert r.code == "LOAD"
        assert (r.keyrange_begin, r.keyrange_end) == ("", 5)


# ---------------------------------------------------------------------------
# store / service / coordinator CAS
# ---------------------------------------------------------------------------


class TestStoreAndCoordinator:
    def _setup(self, tmp_path, n_servers=3):
        cdir = ConfigDirectory(str(tmp_path / "registry.json"))
        cdir.cluster_create("c1", replication_factor=2)
        services = {
            f"s{i}": MetadataService(MetadataStore(str(tmp_path / f"s{i}")))
            for i in range(1, n_servers + 1)
        }
        coord = MetadataCoordinator(
            cdir,
            local_server_id="s1",
            local_service=services["s1"],
            remote_service_factory=lambda sid: services[sid],
        )
        f = MetadataFile.initial("uint64", "time", "tbl", ["s1", "s2"])
        coord.create_file("db1", "tbl", f, list(services))
        return cdir, services, coord, f

    def test_create_file_replicates_and_sets_head(self, tmp_path):
        cdir, services, coord, f = self._setup(tmp_path)
        for svc in services.values():
            assert file_checksum(svc.get_file("db1", "tbl", f.txnid)) \
                == file_checksum(f)
        cfg = cdir.get_table_config("db1", "tbl")
        assert cfg["metadata_txnid"] == f.txnid
        assert cfg["metadata_txnseq"] == 1
        assert cfg["metadata"]["partitions"][0]["servers"] == ["s1", "s2"]

    def test_perform_and_commit_advances_head(self, tmp_path):
        cdir, services, coord, f = self._setup(tmp_path)
        pid = f.entries[0].partition_id
        op = split_op(pid, 100, input_txnid=f.txnid)
        out = coord.perform_and_commit_operation("db1", "tbl", op)
        cfg = cdir.get_table_config("db1", "tbl")
        assert cfg["metadata_txnid"] == out.txnid
        assert cfg["metadata_txnseq"] == 2
        # every metadata server stores the new txn
        for svc in services.values():
            assert svc.get_file("db1", "tbl", out.txnid).seq == 2

    def test_stale_input_txnid_rejected(self, tmp_path):
        cdir, services, coord, f = self._setup(tmp_path)
        pid = f.entries[0].partition_id
        coord.perform_and_commit_operation(
            "db1", "tbl", split_op(pid, 100, input_txnid=f.txnid)
        )
        with pytest.raises(RuntimeError_, match="concurrent modification"):
            coord.perform_and_commit_operation(
                "db1", "tbl", split_op(pid, 200, input_txnid=f.txnid)
            )

    def test_minority_failure_tolerated(self, tmp_path):
        cdir, services, coord, f = self._setup(tmp_path)
        # s3 unreachable
        broken = dict(services)

        def factory(sid):
            if sid == "s3":
                raise ConnectionError("down")
            return broken[sid]

        coord.remote_service_factory = factory
        pid = f.entries[0].partition_id
        out = coord.perform_and_commit_operation(
            "db1", "tbl", split_op(pid, 100, input_txnid=f.txnid)
        )
        assert cdir.get_table_config("db1", "tbl")["metadata_txnid"] \
            == out.txnid

    def test_majority_failure_aborts(self, tmp_path):
        cdir, services, coord, f = self._setup(tmp_path)

        def factory(sid):
            raise ConnectionError("down")

        coord.remote_service_factory = factory
        pid = f.entries[0].partition_id
        with pytest.raises(RuntimeError_):
            coord.perform_and_commit_operation(
                "db1", "tbl", split_op(pid, 100, input_txnid=f.txnid)
            )
        # head unchanged
        assert cdir.get_table_config("db1", "tbl")["metadata_txnid"] \
            == f.txnid

    def test_precondition_error_surfaces(self, tmp_path):
        cdir, services, coord, f = self._setup(tmp_path)
        pid = f.entries[0].partition_id
        with pytest.raises(RuntimeError_, match="can't be empty"):
            coord.perform_and_commit_operation(
                "db1",
                "tbl",
                split_op(
                    pid, 100, input_txnid=f.txnid, split_servers_high=[]
                ),
            )

    def test_metadata_client_lookup(self, tmp_path):
        from eventql_tpu.db.metadata_service import MetadataClient

        cdir, services, coord, f = self._setup(tmp_path)
        pid = f.entries[0].partition_id
        client = MetadataClient(coord)
        assert client.find_partition("db1", "tbl", 5).partition_id == pid
        out = coord.perform_and_commit_operation(
            "db1",
            "tbl",
            split_op(pid, 100, input_txnid=f.txnid,
                     finalize_immediately=True),
        )
        # cache refreshes on head change
        assert client.find_partition("db1", "tbl", 5).partition_id \
            == f"{pid}_lo"
        assert client.find_partition("db1", "tbl", 100).partition_id \
            == f"{pid}_hi"
        assert [e.partition_id
                for e in client.list_partitions("db1", "tbl", 0, "")] \
            == [f"{pid}_lo", f"{pid}_hi"]
        assert [e.partition_id
                for e in client.list_partitions("db1", "tbl", 0, 100)] \
            == [f"{pid}_lo"]

    def test_latest_file_serves_discovery(self, tmp_path):
        cdir, services, coord, f = self._setup(tmp_path)
        pid = f.entries[0].partition_id
        coord.perform_and_commit_operation(
            "db1", "tbl", split_op(pid, 100, input_txnid=f.txnid)
        )
        r = services["s2"].discover(
            "db1",
            "tbl",
            2,
            {"requester_id": "s1", "partition_id": pid,
             "lookup_by_id": True},
        )
        assert r.code == "SERVE" and r.txnseq == 2
        with pytest.raises(RuntimeError_, match="not available"):
            services["s2"].discover(
                "db1", "tbl", 99,
                {"requester_id": "s1", "partition_id": pid},
            )
