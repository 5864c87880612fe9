if __name__ == "__main__":
    # Guarded so multiprocessing's spawn bootstrap (which re-imports the
    # parent's __main__ as __mp_main__ — see utils.cpu_worker) cannot
    # recursively launch the CLI.
    from cybervision_tpu.cli import main

    raise SystemExit(main())
