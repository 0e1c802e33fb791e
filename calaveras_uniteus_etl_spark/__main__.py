from calaveras_uniteus_etl_spark.cli import main

raise SystemExit(main())
