from distributed_raytracer_tpu.run import main

raise SystemExit(main())
