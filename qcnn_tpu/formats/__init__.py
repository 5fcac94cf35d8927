"""On-disk formats: the reference .bin/.cbn codec and the native checkpoint."""

from qcnn_tpu.formats.reference_codec import (  # noqa: F401
    read_bin,
    write_bin,
    read_cbn,
    write_cbn,
    read_txt,
    write_txt,
    read_asmt,
    convert_asmt,
)
