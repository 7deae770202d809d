from zraytrace_tpu.cli import main

raise SystemExit(main())
