from reference_impl.oracle import ORACLE_FNS  # noqa: F401
