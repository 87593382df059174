/* Test fixture: drive llama_handle_signal mid-generate from plain C.
 *
 * The first streamed chunk simulates a SIGINT by calling
 * llama_handle_signal directly (the function is async-signal-safe, so
 * calling it from the stream callback is strictly easier than from a real
 * handler). The generate must return true after ~1 more token, and a
 * SECOND generate must run to completion — proving the stop flag is
 * per-generate and the session stays resumable.
 *
 * Usage: fl_interrupt <model> <prompt> <n_tokens>
 * Prints "chunks1=<n> chunks2=<m>" on success.
 */
#include <stdio.h>
#include <stdlib.h>

#include "fastllama_c.h"

static int g_chunks = 0;

static void on_token_interrupting(char const* s, int n) {
    (void)s;
    (void)n;
    ++g_chunks;
    if (g_chunks == 1) llama_handle_signal(2 /* SIGINT */);
}

static void on_token_counting(char const* s, int n) {
    (void)s;
    (void)n;
    ++g_chunks;
}

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s <model> <prompt> <n_tokens>\n", argv[0]);
        return 2;
    }
    size_t n_tokens = (size_t)atoi(argv[3]);

    struct llama_model_context_args args =
        llama_create_default_context_args();
    args.n_ctx = 512;
    struct llama_model_context* ctx = llama_create_context(args);
    if (!ctx || !llama_load_model(ctx, argv[1])) {
        fprintf(stderr, "load failed\n");
        return 1;
    }
    if (!llama_ingest(ctx, argv[2])) {
        fprintf(stderr, "ingest failed\n");
        return 1;
    }

    /* greedy; no stop words, so every token streams immediately */
    g_chunks = 0;
    if (!llama_generate(ctx, on_token_interrupting, n_tokens, 40.0f, 0.95f,
                        0.0f, 1.0f)) {
        fprintf(stderr, "interrupted generate returned false\n");
        return 3;
    }
    int chunks1 = g_chunks;

    g_chunks = 0;
    if (!llama_generate(ctx, on_token_counting, n_tokens, 40.0f, 0.95f,
                        0.0f, 1.0f)) {
        fprintf(stderr, "post-interrupt generate returned false\n");
        return 4;
    }
    int chunks2 = g_chunks;

    printf("chunks1=%d chunks2=%d\n", chunks1, chunks2);
    llama_free_context(ctx);
    return 0;
}
