

def test_scc_empty_edge_frame_returns_typed_empty(spark):
    """A threshold filter can legitimately exclude every edge (uniform
    trade counts on the gen corpus): scc_fwbw returns the typed empty
    (node, scc_id) frame instead of dying on its accumulator assert."""
    from realestatedeals_spark.operators.scc import scc_fwbw

    out = scc_fwbw(spark.createDataFrame([], "u long, v long"))
    assert out.count() == 0
    assert out.schema.simpleString() == "struct<node:bigint,scc_id:bigint>"
