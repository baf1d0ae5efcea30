from gridnext_tpu.cli import main

if __name__ == "__main__":
    main()
