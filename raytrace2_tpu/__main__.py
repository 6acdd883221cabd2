from raytrace2_tpu.app import main

raise SystemExit(main())
