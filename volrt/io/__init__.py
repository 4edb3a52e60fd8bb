from volrt.io.pvm import load_volume, read_pvm, read_raw, write_pvm  # noqa: F401
