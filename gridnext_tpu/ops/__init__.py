from gridnext_tpu.ops.hexconv import hex_conv, hex_conv_reference  # noqa: F401
