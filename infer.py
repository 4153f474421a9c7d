"""Inference CLI (reference infer.py contract).

Input modes: single image (-i), directory (-d [+ list file -l]), COCO json (-j),
video/frames stream (--video, double-buffered StreamingPipeline);
optional benchmark warmup (-b), visualization (-v/-o/-s), COCO-format dump.
The image->masks path runs as one fused XLA program (orienmask_tpu.pipeline).
"""

import argparse
import json
import os

import cv2
import numpy as np
from tqdm import tqdm

import orienmask_tpu.config as config_module
import orienmask_tpu.utils.timer as timer
from orienmask_tpu.data.dataset import COCODataset
from orienmask_tpu.eval.coco_eval import COCOMetrics
from orienmask_tpu.pipeline import InferencePipeline
from orienmask_tpu.trainer.builder import build, build_postprocess, build_transform
from orienmask_tpu.trainer.checkpoint import load_checkpoint
import orienmask_tpu.models as model_module
import orienmask_tpu.utils.visualizer as visualizer_module


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Model Inference")
    parser.add_argument("-c", "--config", required=True, type=str)
    parser.add_argument("-w", "--weights", default=None, type=str)
    parser.add_argument("-i", "--image", default=None, type=str)
    parser.add_argument("-d", "--image_dir", default=None, type=str)
    parser.add_argument("-l", "--image_list", default=None, type=str)
    parser.add_argument("-j", "--json_file", default=None, type=str)
    parser.add_argument("-n", "--num_images", default=None, type=int)
    parser.add_argument("-b", "--benchmark", default=None, action="store_true")
    parser.add_argument("-v", "--visualize", default=False, action="store_true")
    parser.add_argument("-o", "--output", default=None, type=str)
    parser.add_argument("-s", "--show", default=False, action="store_true")
    parser.add_argument("--random-weights", action="store_true",
                        help="run with randomly initialized weights (no -w)")
    parser.add_argument("--profile", default=None, type=str,
                        help="capture a jax profiler trace of the main loop to this dir")
    parser.add_argument("--video", default=None, type=str,
                        help="video file or frames directory: streaming mode "
                             "with a double-buffered in-flight pipeline "
                             "(config stream_depth, e.g. the 736x736 config)")
    parser.add_argument("--spatial", default=None, type=int, metavar="N",
                        help="shard each image's rows over N devices "
                             "(GSPMD conv halo exchange) — multi-chip "
                             "batch-1 latency at large resolutions")
    parser.add_argument("--stream-depth", default=None, type=int,
                        help="override the in-flight frame depth for --video")
    args = parser.parse_args()

    if args.video and args.output and not args.visualize:
        # In streaming mode -o only makes sense as rendered frames/video;
        # without this, -o silently produced nothing.
        print("--output implies --visualize in --video mode")
        args.visualize = True
    if args.json_file and not args.output:
        # Reference parity (reference infer.py:159,174): accumulation is
        # gated on BOTH -j and -o, but the dump runs on -j alone — so this
        # combination writes empty prediction JSONs. Warn instead of
        # silently discarding every detection.
        print("WARNING: -j without -o accumulates no detections; the dumped "
              "prediction JSONs will be empty (pass -o to keep them)")

    if args.config.endswith(".json"):
        with open(args.config) as fh:
            config = json.load(fh)
    else:
        config = getattr(config_module, args.config)

    # Build model + weights
    model_cfg = dict(config["model"])
    model_cfg["pretrained"] = None
    model = build(model_cfg, model_module)
    if args.weights:
        ckpt = load_checkpoint(args.weights, model)
        variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    elif args.random_weights:
        import jax

        variables = model.init_variables(jax.random.PRNGKey(0))
    else:
        raise SystemExit("either -w <weights> or --random-weights is required")

    transform = build_transform(config["transform"])
    postprocess = build_postprocess(config["postprocess"])
    mesh = None
    if args.spatial and args.spatial > 1:
        from orienmask_tpu.parallel import spatial_mesh

        mesh = spatial_mesh(n_space=args.spatial)
    pipeline = InferencePipeline(
        model, variables, transform, postprocess,
        compute_dtype=config.get("compute_dtype", "bfloat16"), mesh=mesh,
    )
    visualizer = build(config["visualizer"], visualizer_module) \
        if args.visualize else None

    if args.video:
        # Streaming mode (reference analogue: the infer.py -d loop,
        # reference infer.py:144-172, pipelined): depth frames stay
        # submitted-but-unfetched so host decode of frame i overlaps device
        # compute of frames i+1..i+depth.
        import time

        import jax
        from orienmask_tpu.stream import StreamingPipeline

        depth = args.stream_depth or config.get("stream_depth", 2)
        stream = StreamingPipeline(pipeline, depth=depth)

        def frame_source():
            if os.path.isdir(args.video):
                names = sorted(os.listdir(args.video))
                if args.num_images:
                    names = names[: args.num_images]
                for name in names:
                    frame = cv2.imread(os.path.join(args.video, name))
                    if frame is None:
                        continue
                    yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            else:
                cap = cv2.VideoCapture(args.video)
                n = 0
                while cap.isOpened():
                    ok, frame = cap.read()
                    if not ok or (args.num_images and n >= args.num_images):
                        break
                    n += 1
                    yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                cap.release()

        to_video = bool(args.output) and args.output.endswith((".mp4", ".avi"))
        if args.output and not to_video:
            os.makedirs(args.output, exist_ok=True)
        writer = None  # created lazily once the first frame size is known
        src_fps = 25.0  # frame-dir inputs carry no rate; video inputs do
        if to_video and not os.path.isdir(args.video):
            cap0 = cv2.VideoCapture(args.video)
            fps_val = cap0.get(cv2.CAP_PROP_FPS)
            cap0.release()
            if fps_val and np.isfinite(fps_val) and fps_val > 0:
                src_fps = float(fps_val)

        src_frames = []  # parallel to the in-flight queue (lag = depth)
        n_frames = 0
        n_out = 0
        t_start = time.perf_counter()

        def emit(predictions):
            global writer, n_out
            src = src_frames.pop(0)
            if args.visualize:
                show = visualizer(predictions[0], src.astype(np.float32),
                                  pipeline.pad_info)
                if args.output:
                    bgr = cv2.cvtColor(show, cv2.COLOR_RGB2BGR)
                    if to_video:
                        if writer is None:
                            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                            writer = cv2.VideoWriter(
                                args.output, fourcc, src_fps,
                                (show.shape[1], show.shape[0]))
                        writer.write(bgr)
                    else:
                        cv2.imwrite(
                            os.path.join(args.output, f"frame_{n_out:06d}.jpg"),
                            bgr)
            n_out += 1

        for frame in frame_source():
            if n_frames == 0 and args.benchmark:
                for _ in range(10):  # warmup compile outside the timed loop
                    warm = pipeline.run_device(frame[None])
                jax.block_until_ready(warm)  # execution too, not just compile
                t_start = time.perf_counter()
            stream.submit(frame[None])
            src_frames.append(frame)
            n_frames += 1
            if stream.ready():
                emit(stream.retrieve())
        for predictions in stream.drain():
            emit(predictions)
        if writer is not None:
            writer.release()
        elapsed = time.perf_counter() - t_start
        if n_frames == 0:
            raise SystemExit(f"no frames decoded from {args.video}")
        print(f"Streamed {n_frames} frames (depth={depth}) in {elapsed:.2f}s")
        print("The average streaming time is %.2f ms (%.2f fps)"
              % (1000 * elapsed / n_frames, n_frames / elapsed))
        raise SystemExit(0)

    # Resolve input images
    coco_metrics = None
    sample_infos = None
    if args.image:
        file_names = [os.path.basename(args.image)]
        image_files = [args.image]
    elif args.json_file:
        with open(args.json_file) as fh:
            json_images = json.load(fh)["images"]
        if args.num_images:
            json_images = json_images[: args.num_images]
        file_names = [im["file_name"] for im in json_images]
        image_files = [os.path.join(args.image_dir, f) for f in file_names]
        sample_infos = [{"height": im["height"], "width": im["width"], "id": im["id"]}
                        for im in json_images]
        coco_metrics = COCOMetrics(
            gt_file=None, cat2label=COCODataset.CAT2LABEL, with_mask=True,
            save_dir=args.output if args.output else ".",
        )
    elif args.image_dir:
        if args.image_list:
            file_names = [ln.strip() for ln in open(args.image_list) if ln.strip()]
        else:
            # Raw listdir (reference) chokes on stray non-images
            # (.DS_Store, annotation jsons, subdirs) — keep only files cv2
            # stands a chance of decoding.
            exts = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")
            file_names = sorted(
                f for f in os.listdir(args.image_dir)
                if f.lower().endswith(exts)
            )
        if args.num_images:
            file_names = file_names[: args.num_images]
        image_files = [os.path.join(args.image_dir, f) for f in file_names]
    else:
        raise ValueError("Either image or image_dir should be given.")

    output_files = None
    if args.output:
        os.makedirs(args.output, exist_ok=True)
        output_files = [os.path.join(args.output, f) for f in file_names]

    timer.reset()

    def load_image(path):
        img = cv2.imread(path)
        if img is None:
            raise SystemExit(f"could not read image: {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    if args.benchmark:
        warm = load_image(image_files[0])[None]
        for _ in range(10):
            dets, _ = pipeline(warm)

    from orienmask_tpu.utils.profiler import trace

    n_iter = len(image_files)
    with trace(args.profile), timer.timer("Main Loop") as main_t:
        for idx, image_file in tqdm(list(enumerate(image_files)), total=n_iter):
            with timer.timer("Load data"):
                src_image = load_image(image_file)

            with timer.timer("Forward & Postprocess") as t:
                out = pipeline.run_device(src_image[None])
                t.sync(out)
            predictions = postprocess.to_host_list(out)
            pad_info = pipeline.pad_info

            if args.json_file and args.output:
                with timer.timer("Convert Format"):
                    info = [dict(sample_infos[idx], collate_pad=pad_info)]
                    dets = coco_metrics.to_coco_format(info, predictions)
                    coco_metrics.update_results(dets)

            if args.visualize:
                with timer.timer("Visualize"):
                    show = visualizer(predictions[0], src_image.astype(np.float32),
                                      pad_info)
                    if args.show:
                        import matplotlib.pyplot as plt

                        plt.imshow(show)
                        plt.show()
                    if args.output:
                        cv2.imwrite(output_files[idx],
                                    cv2.cvtColor(show, cv2.COLOR_RGB2BGR))

    if args.json_file and coco_metrics is not None:
        with open(coco_metrics.bbox_pred_file, "w") as fh:
            json.dump(coco_metrics.bbox_results, fh)
        with open(coco_metrics.segm_pred_file, "w") as fh:
            json.dump(coco_metrics.segm_results, fh)

    timer_log = timer.get_all_elapsed_time()
    duration = timer_log.pop("Main Loop")
    print("The inference takes {0} seconds.".format(duration / 1000))
    print("The average inference time is %.2f ms (%.2f fps)"
          % (duration / n_iter, 1000 * n_iter / duration))
    for key, value in timer_log.items():
        print("%s: %.2fms (%.2ffps)" % (key, value, 1000 / value))
