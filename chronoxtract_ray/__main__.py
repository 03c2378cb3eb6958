from chronoxtract_ray.cli import main

raise SystemExit(main())
