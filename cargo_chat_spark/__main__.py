from cargo_chat_spark.cli import main

raise SystemExit(main())
