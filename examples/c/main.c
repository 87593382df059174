/* Minimal C client of the fastllama_tpu C ABI — the TPU counterpart of the
 * reference's C example (/root/reference/interfaces/c/main.cpp): create a
 * context, load a model, ingest a prompt, stream a completion to stdout.
 *
 * Build (after `make -C fastllama_tpu/native c_abi`):
 *   gcc examples/c/main.c -Ifastllama_tpu/native \
 *       -Lfastllama_tpu/native -lfastllama_c -o fl_demo
 *   LD_LIBRARY_PATH=fastllama_tpu/native PYTHONPATH=. \
 *       ./fl_demo path/to/model.bin "Hello" 32
 *
 * Usage: fl_demo <model> <prompt> [n_tokens] [temp]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "fastllama_c.h"

static void on_token(char const* s, int n) {
    fwrite(s, 1, (size_t)n, stdout);
    fflush(stdout);
}

static void on_log_err(char const* fn, int fn_len, char const* msg,
                       int msg_len) {
    fprintf(stderr, "[err %.*s] %.*s", fn_len, fn, msg_len, msg);
}

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <model> <prompt> [n_tokens] [temp]\n",
                argv[0]);
        return 2;
    }
    const char* model_path = argv[1];
    const char* prompt = argv[2];
    size_t n_tokens = argc > 3 ? (size_t)atoi(argv[3]) : 64;
    float temp = argc > 4 ? (float)atof(argv[4]) : 0.0f;

    struct llama_model_context_args args =
        llama_create_default_context_args();
    args.n_ctx = 512;
    args.logger.log_err = on_log_err;

    struct llama_model_context* ctx = llama_create_context(args);
    if (!ctx) {
        fprintf(stderr, "context creation failed\n");
        return 1;
    }
    if (!llama_load_model(ctx, model_path)) {
        fprintf(stderr, "model load failed: %s\n", model_path);
        llama_free_context(ctx);
        return 1;
    }

    const char* stops[] = {"###"};
    llama_set_stop_words(ctx, stops, 1);

    if (!llama_ingest(ctx, prompt)) {
        fprintf(stderr, "ingest failed\n");
        llama_free_context(ctx);
        return 1;
    }
    if (!llama_generate(ctx, on_token, n_tokens, 40.0f, 0.95f, temp, 1.0f)) {
        fprintf(stderr, "generate failed\n");
        llama_free_context(ctx);
        return 1;
    }
    printf("\n");

    struct llama_array_view_f logits = llama_get_logits(ctx);
    fprintf(stderr, "logits: %zu values\n", logits.size);

    llama_free_context(ctx);
    return 0;
}
