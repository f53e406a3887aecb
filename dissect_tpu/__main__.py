"""python -m dissect_tpu — the CLI entry point (main.cpp parity)."""

from dissect_tpu.analysis.dispatcher import main

if __name__ == "__main__":
    main()
