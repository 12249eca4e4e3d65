from scpn_fusion_tpu.io.geqdsk import GEqdsk, read_geqdsk, write_geqdsk  # noqa: F401
