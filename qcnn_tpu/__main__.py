from qcnn_tpu.cli import main

raise SystemExit(main())
