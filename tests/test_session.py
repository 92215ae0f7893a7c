"""Master/shuffle-partition resolution for local vs spark-submit launches.

The production failure mode this guards: ``get_spark()`` calling
``builder.master()`` unconditionally would silently override a
``spark-submit --master spark://...`` launch and run the whole job inside
the driver JVM (local mode) — the cluster would sit idle and the job
would "work", just not scale. ``resolve_master`` must therefore return
None (leave the launcher's value untouched) exactly when the process was
launched by spark-submit and the caller didn't force a master.
"""

from search_engine_spark.session import resolve_master


def test_plain_python_defaults_to_local_n():
    m, sp = resolve_master(None, under_submit=False, cpus=8,
                           shuffle_partitions=None)
    assert m == "local[8]"
    assert sp == 8


def test_under_submit_leaves_launcher_master_untouched():
    m, sp = resolve_master(None, under_submit=True, cpus=8,
                           shuffle_partitions=None)
    assert m is None  # spark-submit's --master governs
    assert sp is None  # cluster sizes shuffle partitions via --conf


def test_explicit_master_wins_even_under_submit():
    m, sp = resolve_master("local[2]", under_submit=True, cpus=8,
                           shuffle_partitions=None)
    assert m == "local[2]"
    assert sp == 2  # derived from the bracket count, not cpus


def test_local_star_sizes_partitions_from_cpus():
    m, sp = resolve_master("local[*]", under_submit=False, cpus=16,
                           shuffle_partitions=None)
    assert m == "local[*]"
    assert sp == 16


def test_explicit_shuffle_partitions_pass_through():
    m, sp = resolve_master("local[4]", under_submit=False, cpus=32,
                           shuffle_partitions=7)
    assert sp == 7
