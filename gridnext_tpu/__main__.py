from gridnext_tpu.cli import main

main()
