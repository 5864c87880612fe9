from cybervision_tpu.cli import main

raise SystemExit(main())
